"""Materialize the char-trigram language-ID model as a committed parquet
side-table (the gen_hyperplanes.py / gen_ivf_centroids.py pattern).

Round-3 verdict Next #7 (broadened in round 5 to 10 languages, round-4
verdict Next #4): a classic add-one-smoothed character-trigram naive-Bayes
model (Cavnar & Trenkle, "N-Gram-Based Text Categorization", SDAIR'94)
trained over small embedded seed corpora (UDHR Article 1 translations —
public domain — plus everyday sentences composed for this tool) and written
as (lang, tri, w) where

    w = round(log((count(tri|lang)+1) / (total(lang)+V)) * 1e6)  as BIGINT

Integer micro-log-prob weights ON PURPOSE: document scores are then exact
BIGINT sums — partition-order-independent on Spark and bit-equal in the
DuckDB oracle, so the argmax can never flip on float summation order. The
per-language unseen-trigram weight is stored as the tri='' row (a real
trigram always has length 3).

Whitespace normalization uses an EXPLICIT character class (WS_CLASS) instead
of \\s because the three regex dialects in play disagree on \\s: Java (Spark)
includes \\x0b, RE2 (DuckDB) excludes it, Python re is full Unicode (round-4
ADVICE). The one spelling below parses identically in all three.

Regenerate with:  python tools/gen_langid_trigrams.py
"""

import math
import os
import re
import sys
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from web_crawler_spark.functions.text import LANGID_WS_CLASS  # noqa: E402

OUT = os.path.join(os.path.dirname(__file__), "..", "web_crawler_spark",
                   "data", "langid_trigrams_v2.parquet")

#: identical byte-for-byte in Java regex, RE2 and Python re — single source
#: of truth lives next to the Spark scorer it must match
WS_CLASS = LANGID_WS_CLASS

#: seed corpora: UDHR Article 1 (public domain) + everyday sentences
#: composed for this tool. 10 languages.
SEEDS = {
    "en": (
        "All human beings are born free and equal in dignity and rights. "
        "They are endowed with reason and conscience and should act towards "
        "one another in a spirit of brotherhood. "
        "The weather is nice today and the children are playing in the park. "
        "I would like a cup of coffee with milk and sugar, please. "
        "She reads the newspaper every morning before going to work. "
        "This is the house that my grandfather built many years ago. "
        "We should meet tomorrow afternoon to talk about the new project."
    ),
    "de": (
        "Alle Menschen sind frei und gleich an Würde und Rechten geboren. "
        "Sie sind mit Vernunft und Gewissen begabt und sollen einander im "
        "Geist der Brüderlichkeit begegnen. "
        "Das Wetter ist heute schön und die Kinder spielen im Park. "
        "Ich hätte gerne eine Tasse Kaffee mit Milch und Zucker, bitte. "
        "Sie liest jeden Morgen die Zeitung, bevor sie zur Arbeit geht. "
        "Das ist das Haus, das mein Großvater vor vielen Jahren gebaut hat. "
        "Wir sollten uns morgen Nachmittag treffen, um über das neue "
        "Projekt zu sprechen."
    ),
    "fr": (
        "Tous les êtres humains naissent libres et égaux en dignité et en "
        "droits. Ils sont doués de raison et de conscience et doivent agir "
        "les uns envers les autres dans un esprit de fraternité. "
        "Il fait beau aujourd'hui et les enfants jouent dans le parc. "
        "Je voudrais une tasse de café avec du lait et du sucre, s'il vous "
        "plaît. Elle lit le journal tous les matins avant d'aller au "
        "travail. C'est la maison que mon grand-père a construite il y a "
        "de nombreuses années. Nous devrions nous retrouver demain "
        "après-midi pour parler du nouveau projet."
    ),
    "es": (
        "Todos los seres humanos nacen libres e iguales en dignidad y "
        "derechos y, dotados como están de razón y conciencia, deben "
        "comportarse fraternalmente los unos con los otros. "
        "Hoy hace buen tiempo y los niños juegan en el parque. "
        "Quisiera una taza de café con leche y azúcar, por favor. "
        "Ella lee el periódico todas las mañanas antes de ir al trabajo. "
        "Esta es la casa que construyó mi abuelo hace muchos años. "
        "Deberíamos reunirnos mañana por la tarde para hablar del nuevo "
        "proyecto."
    ),
    "it": (
        "Tutti gli esseri umani nascono liberi ed eguali in dignità e "
        "diritti. Essi sono dotati di ragione e di coscienza e devono "
        "agire gli uni verso gli altri in spirito di fratellanza. "
        "Oggi il tempo è bello e i bambini giocano nel parco. "
        "Vorrei una tazza di caffè con latte e zucchero, per favore. "
        "Lei legge il giornale ogni mattina prima di andare al lavoro. "
        "Questa è la casa che mio nonno ha costruito molti anni fa. "
        "Dovremmo incontrarci domani pomeriggio per parlare del nuovo "
        "progetto."
    ),
    "pt": (
        "Todos os seres humanos nascem livres e iguais em dignidade e em "
        "direitos. Dotados de razão e de consciência, devem agir uns para "
        "com os outros em espírito de fraternidade. "
        "Hoje o tempo está bom e as crianças brincam no parque. "
        "Eu gostaria de uma xícara de café com leite e açúcar, por favor. "
        "Ela lê o jornal todas as manhãs antes de ir ao trabalho. "
        "Esta é a casa que o meu avô construiu há muitos anos. "
        "Devíamos encontrar-nos amanhã à tarde para falar do novo projeto."
    ),
    "nl": (
        "Alle mensen worden vrij en gelijk in waardigheid en rechten "
        "geboren. Zij zijn begiftigd met verstand en geweten, en behoren "
        "zich jegens elkander in een geest van broederschap te gedragen. "
        "Het weer is vandaag mooi en de kinderen spelen in het park. "
        "Ik wil graag een kopje koffie met melk en suiker, alstublieft. "
        "Zij leest elke ochtend de krant voordat ze naar haar werk gaat. "
        "Dit is het huis dat mijn grootvader vele jaren geleden heeft "
        "gebouwd. We zouden elkaar morgenmiddag moeten ontmoeten om over "
        "het nieuwe project te praten."
    ),
    "sv": (
        "Alla människor är födda fria och lika i värde och rättigheter. "
        "De har utrustats med förnuft och samvete och bör handla gentemot "
        "varandra i en anda av gemenskap. "
        "Vädret är fint idag och barnen leker i parken. "
        "Jag skulle vilja ha en kopp kaffe med mjölk och socker, tack. "
        "Hon läser tidningen varje morgon innan hon går till arbetet. "
        "Det här är huset som min farfar byggde för många år sedan. "
        "Vi borde träffas i morgon eftermiddag för att prata om det nya "
        "projektet."
    ),
    "id": (
        "Semua orang dilahirkan merdeka dan mempunyai martabat dan hak-hak "
        "yang sama. Mereka dikaruniai akal dan hati nurani dan hendaknya "
        "bergaul satu sama lain dalam semangat persaudaraan. "
        "Cuaca hari ini cerah dan anak-anak bermain di taman. "
        "Saya ingin secangkir kopi dengan susu dan gula. "
        "Dia membaca koran setiap pagi sebelum berangkat kerja. "
        "Ini adalah rumah yang dibangun kakek saya bertahun-tahun yang "
        "lalu. Kita sebaiknya bertemu besok sore untuk membicarakan "
        "proyek baru itu."
    ),
    "tr": (
        "Bütün insanlar hür, haysiyet ve haklar bakımından eşit doğarlar. "
        "Akıl ve vicdana sahiptirler ve birbirlerine karşı kardeşlik "
        "zihniyeti ile hareket etmelidirler. "
        "Bugün hava güzel ve çocuklar parkta oynuyor. "
        "Sütlü ve şekerli bir fincan kahve istiyorum, lütfen. "
        "O, işe gitmeden önce her sabah gazete okur. "
        "Bu, büyükbabamın yıllar önce yaptığı evdir. "
        "Yarın öğleden sonra yeni projeyi konuşmak için buluşmalıyız."
    ),
}

MICRO = 1_000_000


def normalize(text: str) -> str:
    """MUST match the Spark/DuckDB sides: trim, lowercase, collapse
    whitespace (explicit WS_CLASS, not \\s) to single spaces."""
    return re.sub(WS_CLASS, " ", text.strip()).lower()


def trigrams(text: str):
    t = normalize(text)
    return [t[i:i + 3] for i in range(len(t) - 2)]


def main() -> None:
    counts = {lang: Counter(trigrams(txt)) for lang, txt in SEEDS.items()}
    vocab = set()
    for c in counts.values():
        vocab.update(c)
    v = len(vocab)

    langs, tris, ws = [], [], []
    for lang in sorted(counts):
        c = counts[lang]
        total = sum(c.values())
        for tri in sorted(c):
            logp = math.log((c[tri] + 1) / (total + v))
            langs.append(lang)
            tris.append(tri)
            ws.append(round(logp * MICRO))
        # unseen-trigram weight, stored under the impossible key ''
        langs.append(lang)
        tris.append("")
        ws.append(round(math.log(1.0 / (total + v)) * MICRO))

    table = pa.table({
        "lang": pa.array(langs, type=pa.string()),
        "tri": pa.array(tris, type=pa.string()),
        "w": pa.array(ws, type=pa.int64()),
    })
    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    pq.write_table(table, OUT)
    print(f"wrote {table.num_rows} rows ({len(SEEDS)} langs, vocab {v}) "
          f"to {os.path.abspath(OUT)}")


if __name__ == "__main__":
    main()
