"""Materialize the char-trigram language-ID model as a committed parquet
side-table (the gen_hyperplanes.py / gen_ivf_centroids.py pattern).

Round-3 verdict Next #7: the 10-stopword langid heuristic is not credible
on real multilingual web text. This trains a classic add-one-smoothed
character-trigram naive-Bayes model (Cavnar & Trenkle, "N-Gram-Based Text
Categorization", SDAIR'94) over small embedded seed corpora (UDHR Article 1
translations — public domain — plus everyday sentences composed for this
tool) and writes (lang, tri, w) where

    w = round(log((count(tri|lang)+1) / (total(lang)+V)) * 1e6)  as BIGINT

Integer micro-log-prob weights ON PURPOSE: document scores are then exact
BIGINT sums — partition-order-independent on Spark and bit-equal in the
DuckDB oracle, so the argmax can never flip on float summation order. The
per-language unseen-trigram weight is stored as the tri='' row (a real
trigram always has length 3).

Regenerate with:  python tools/gen_langid_trigrams.py
"""

import math
import os
import re
from collections import Counter

import pyarrow as pa
import pyarrow.parquet as pq

OUT = os.path.join(os.path.dirname(__file__), "..", "web_crawler_spark",
                   "data", "langid_trigrams_v1.parquet")

#: seed corpora: UDHR Article 1 (public domain) + everyday sentences.
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
}

MICRO = 1_000_000


def normalize(text: str) -> str:
    """MUST match the Spark/DuckDB sides: trim, lowercase, collapse
    whitespace to single spaces."""
    return re.sub(r"\s+", " ", text.strip()).lower()


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
