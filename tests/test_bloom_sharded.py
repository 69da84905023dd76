"""Shard-aligned bloom probing (round-3 verdict Next #4).

The broadcast probe ships the whole filter to every python worker — fine
locally, fatal at the 10^10-URL / ~12 GB scale. The cogroup plan
repartitions candidates by pmod(h1, n_shards) and hands each task exactly
one shard's bit array as DATA. These tests pin (a) value equality with the
broadcast path, (b) that the serialized probe task excludes the bits, and
(c) the engine e2e seen-set is unchanged when forced onto the sharded plan.
"""

from pyspark.sql import functions as F

from web_crawler_spark.operators import dedup


def _urls(spark, n, start=0, prefix="https://h/x"):
    return spark.range(start, start + n).select(
        F.concat(F.lit(prefix), F.col("id").cast("string")).alias("url"))


def test_sharded_probe_matches_broadcast_probe(spark):
    seen = _urls(spark, 3000)
    b = dedup.BloomShards.sized_for(3000)
    b.add_df(seen)
    cand = _urls(spark, 2000, start=2000)      # 1000 seen, 1000 new

    bh1, bh2 = dedup.bloom_hash_cols(F.col("url"))
    broadcast = {(r.url, r.f) for r in cand.select(
        "url", b.might_contain_udf()(bh1, bh2).alias("f")).collect()}
    sharded = {(r.url, r["__maybe_seen"]) for r in
               b.flag_maybe_seen(cand).collect()}
    assert sharded == broadcast
    # and no false negatives on the genuinely-seen half
    flagged = dict(sharded)
    for r in _urls(spark, 1000, start=2000).collect():
        assert flagged[r.url] is True


def test_sharded_probe_closure_is_bitsfree(spark):
    """The task closure must ship ~KBs no matter how large the filter is:
    the bits ride the cogrouped (shard, bits) rows, not the function."""
    import pickle

    b = dedup.BloomShards(n_shards=16, n_bits_per_shard=1 << 22)  # 8 MB total
    b.add_df(_urls(spark, 1000))
    assert b.total_bytes() >= 8 << 20
    fn = dedup._sharded_probe_fn(b.n_bits, b.n_hashes)
    blob = pickle.dumps((fn.__code__.co_consts,
                         [c.cell_contents for c in fn.__closure__ or []]))
    assert len(blob) < 4096, len(blob)


def test_seen_filter_sharded_equals_exact(spark):
    seen = _urls(spark, 5000)
    b = dedup.BloomShards.sized_for(5000)
    b.add_df(seen)
    cand = _urls(spark, 4000, start=3000)
    exact = {r.url for r in
             cand.join(seen, "url", "left_anti").collect()}
    got = {r.url for r in
           dedup.seen_filter(cand, seen, b, shard_aligned=True).collect()}
    assert got == exact


def test_engine_seen_set_unchanged_on_sharded_plan(spark, tmp_path):
    """Full-engine equality: the bloom-probed engine (persisted seen_shards
    table + shard-aligned cogroup, bloom always on) must store exactly the
    same article url set as an engine running the plain exact anti-join
    (bloom never engaged) on the same synthetic web."""
    from web_crawler_spark import html_synth
    from web_crawler_spark.plans.epoch import CrawlConfig, CrawlEngine

    web = html_synth.synth_web(n_articles=120, n_hosts=4, seed=11)
    pages = html_synth.pages_df(spark, web, 8)
    seeds = html_synth.seeds_df(spark, web)

    eng_a = CrawlEngine(spark, str(tmp_path / "a"), pages,
                        CrawlConfig(bloom_min_articles=1 << 30))  # never
    eng_a.run(seeds, max_epochs=6)
    eng_b = CrawlEngine(spark, str(tmp_path / "b"), pages,
                        CrawlConfig(bloom_min_articles=0))        # always
    eng_b.run(seeds, max_epochs=6)

    a = {r.url for r in eng_a.articles.read(spark).select("url").collect()}
    bset = {r.url for r in eng_b.articles.read(spark).select("url").collect()}
    assert a == bset and len(a) > 0


def test_seen_shards_table_roundtrip_and_or_merge(spark, tmp_path):
    """The fully driver-free path (SURVEY §6 `seen_shards` table):
    build_bits_df (distributed) → parquet per epoch → union + or_merge →
    flag_maybe_seen(bits=...) — the filter bytes never visit the driver —
    must equal the driver-dict probe over the union of both epochs."""
    b = dedup.BloomShards.sized_for(4000)
    epoch0, epoch1 = _urls(spark, 2000), _urls(spark, 2000, start=2000)
    p0, p1 = str(tmp_path / "s0"), str(tmp_path / "s1")
    b.build_bits_df(epoch0).write.parquet(p0)
    b.build_bits_df(epoch1).write.parquet(p1)
    merged = dedup.BloomShards.or_merge_bits(
        spark.read.parquet(p0).unionByName(spark.read.parquet(p1)))
    assert merged.count() <= b.n_shards   # one row per shard after merge

    cand = _urls(spark, 3000, start=3000)  # 1000 seen, 2000 new
    table_path = {(r.url, r["__maybe_seen"]) for r in
                  b.flag_maybe_seen(cand, bits=merged).collect()}

    ref = dedup.BloomShards(n_shards=b.n_shards, n_bits_per_shard=b.n_bits,
                            n_hashes=b.n_hashes)
    ref.add_df(epoch0.unionByName(epoch1))
    bh1, bh2 = dedup.bloom_hash_cols(F.col("url"))
    dict_path = {(r.url, r.f) for r in cand.select(
        "url", ref.might_contain_udf()(bh1, bh2).alias("f")).collect()}
    assert table_path == dict_path
    # no false negatives on the seen slice
    flags = dict(table_path)
    for r in _urls(spark, 1000, start=3000).collect():
        assert flags[r.url] is True


def test_sharded_probe_ors_unmerged_epoch_tables(spark, tmp_path):
    """code-review round 4: a multi-epoch seen_shards table that was NOT
    or_merged has several (shard, bits) rows per shard — the probe must OR
    them all; reading only the first row would produce bloom false
    negatives, the one failure mode the two-stage seen filter can't absorb."""
    b = dedup.BloomShards.sized_for(4000)
    e0, e1 = _urls(spark, 2000), _urls(spark, 2000, start=2000)
    p0, p1 = str(tmp_path / "s0"), str(tmp_path / "s1")
    b.build_bits_df(e0).write.parquet(p0)
    b.build_bits_df(e1).write.parquet(p1)
    unmerged = spark.read.parquet(p0).unionByName(spark.read.parquet(p1))
    flags = {r.url: r["__maybe_seen"] for r in
             b.flag_maybe_seen(_urls(spark, 4000), bits=unmerged).collect()}
    assert all(flags[r.url] for r in e0.collect())   # no false negatives
    assert all(flags[r.url] for r in e1.collect())


def test_sparse_append_equals_dense_everywhere(spark, tmp_path):
    """Round 5: the sparse positions payload must be (a) byte-equal to the
    dense build after or_merge densification, (b) probe-equal when mixed
    dense+sparse rows coexist in one table, and (c) MUCH smaller than the
    dense form for a small epoch on a big-capacity filter — the property
    that makes the per-epoch seen_shards append O(bits set)."""
    import numpy as np
    b = dedup.BloomShards.sized_for(2_000_000)   # big capacity
    small = _urls(spark, 5_000)                  # small epoch
    dense_rows = {r.shard: bytes(r.bits)
                  for r in b.build_bits_df(small).collect()}
    sparse_rows = {r.shard: bytes(r.bits)
                   for r in b.build_bits_df(small, sparse=True).collect()}
    assert set(dense_rows) == set(sparse_rows)
    dense_total = sum(len(v) for v in dense_rows.values())
    sparse_total = sum(len(v) for v in sparse_rows.values())
    assert sparse_total < dense_total / 10, (sparse_total, dense_total)
    # (a) densify == dense, via the instance or_merge
    p = str(tmp_path / "sparse")
    b.build_bits_df(small, sparse=True).write.parquet(p)
    merged = {r.shard: bytes(r.bits)
              for r in b.or_merge_bits(spark.read.parquet(p)).collect()}
    assert merged == dense_rows
    # (b) mixed-format table probes identically to the all-dense reference
    e1 = _urls(spark, 3_000, start=100_000)
    p0, p1 = str(tmp_path / "d0"), str(tmp_path / "s1")
    b.build_bits_df(small).write.parquet(p0)              # dense epoch
    b.build_bits_df(e1, sparse=True).write.parquet(p1)    # sparse epoch
    mixed = spark.read.parquet(p0).unionByName(spark.read.parquet(p1))
    ref = dedup.BloomShards(n_shards=b.n_shards,
                            n_bits_per_shard=b.n_bits,
                            n_hashes=b.n_hashes)
    ref.add_df(small.unionByName(e1))
    cand = _urls(spark, 9_000)                   # seen + unseen + e1 range
    got = {r.url: r["__maybe_seen"] for r in
           b.flag_maybe_seen(cand, bits=mixed).collect()}
    bh1, bh2 = dedup.bloom_hash_cols(F.col("url"))
    want = {r.url: r.f for r in cand.select(
        "url", ref.might_contain_udf()(bh1, bh2).alias("f")).collect()}
    assert got == want
    # (c) sparse payloads round-trip through _densify exactly
    for s, payload in sparse_rows.items():
        assert np.array_equal(dedup._densify(payload, b.n_bits),
                              np.frombuffer(dense_rows[s], dtype="uint8"))
    # static legacy call on an all-sparse group fails LOUD, not wrong
    import pytest
    with pytest.raises(Exception, match="all-sparse"):
        dedup.BloomShards.or_merge_bits(spark.read.parquet(p)).collect()
