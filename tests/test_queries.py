"""Local replica of the driver's correctness gate: run each queries() entry
in Spark AND its oracle_sql() in DuckDB on the same parquet tables, compare
row count, column names, and order-insensitive values."""

import math
import os

import duckdb
import pytest

SF_DIR = os.environ.get("SYMSPARK_TEST_SF_DIR", "/root/testdata/sf0.001")

import __spark_entry__ as entrymod  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def _rowset(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_norm(r[i]) for i in order) for r in rows)


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in entrymod.Q.TABLES:
        path = os.path.join(SF_DIR, f"{t}.parquet")
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


@pytest.mark.parametrize("name", sorted(ORACLES))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    srows = sdf.collect()
    scols = sdf.columns

    rel = duck.sql(ORACLES[name])
    dcols = rel.columns
    drows = rel.fetchall()

    assert sorted(c.lower() for c in scols) == sorted(c.lower() for c in dcols), (
        f"{name}: column mismatch {scols} vs {dcols}"
    )
    assert len(srows) == len(drows), f"{name}: row count {len(srows)} vs {len(drows)}"
    s = _rowset([c.lower() for c in scols], [tuple(r) for r in srows])
    d = _rowset([c.lower() for c in dcols], drows)
    assert s == d, f"{name}: value mismatch\nspark: {s[:5]}\nduck:  {d[:5]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    assert df.count() >= 0


def test_no_persisted_rdds_after_catalog_sweep(spark):
    """The dedup/ANN builders pin narrow intermediates; a catalog sweep must
    not leak cached RDDs into the session (round-2 advisor finding)."""
    from symspark.plans import queries as Q

    Q.release_caches()  # drop pins left by earlier tests' builders
    before = spark.sparkContext._jsc.getPersistentRDDs().size()
    for name in ("dedup_minhash_lsh", "dedup_ngram_jaccard", "dedup_embedding_cosine"):
        QUERIES[name](spark, SF_DIR).collect()
    Q.release_caches()
    # back to the pre-sweep count (other fixtures may hold their own pins)
    assert spark.sparkContext._jsc.getPersistentRDDs().size() == before


def test_dedup_embedding_multiprobe_recall(spark):
    """Radius-1 multiprobe must strictly dominate single-probe blocking on
    cross-bucket pair recall vs the brute-force all-pairs oracle (the r3
    judge finding: single-probe missed every Hamming-1 pair)."""
    from pyspark.sql import functions as F
    from symspark.plans import queries as Q

    e = Q._t(spark, SF_DIR, "embeddings").select("vec_id", "embedding")
    a, b = e.alias("a"), e.alias("b")
    sim = Q._cosine_pd()(F.col("a.embedding"), F.col("b.embedding"))
    brute = {
        (r["va"], r["vb"])
        for r in a.join(b, F.col("a.vec_id") < F.col("b.vec_id"))
        .select(
            F.col("a.vec_id").alias("va"), F.col("b.vec_id").alias("vb"),
            F.round(sim, 3).alias("sim"),
        )
        .filter(F.col("sim") >= 0.35)
        .collect()
    }
    single = {
        (r["vec_a"], r["vec_b"])
        for r in Q._dedup_embedding_impl(spark, SF_DIR, radius=0).collect()
    }
    multi = {
        (r["vec_a"], r["vec_b"])
        for r in Q._dedup_embedding_impl(spark, SF_DIR, radius=1).collect()
    }
    assert brute, "fixture produced no near-dup pairs; threshold too high"
    assert single <= brute and multi <= brute  # blocking never invents pairs
    r_single = len(single) / len(brute)
    r_multi = len(multi) / len(brute)
    assert r_multi >= r_single
    assert r_multi >= 0.5, (r_single, r_multi, len(brute))


def test_ann_lsh_topk_recall(spark):
    """The LSH scale path must beat random-candidate recall by a wide
    margin: hamming<=1 multiprobe touches 5/16 of the corpus (random
    recall ~0.31); require >=0.5 overlap with brute-force top-10."""
    bf = [r.vec_id for r in QUERIES["ann_cosine_topk"](spark, SF_DIR).collect()]
    lsh = [r.vec_id for r in QUERIES["ann_lsh_topk"](spark, SF_DIR).collect()]
    assert len(set(bf) & set(lsh)) / 10 >= 0.5


def test_ann_lsh_topk_wide_recall(spark):
    """Wide config (6 planes, 64 buckets): multiprobe touches ~7/64 of the
    corpus (random recall ~0.11); sign-LSH locality must beat that."""
    bf = [r.vec_id for r in QUERIES["ann_cosine_topk"](spark, SF_DIR).collect()]
    lsh = [r.vec_id for r in QUERIES["ann_lsh_topk_wide"](spark, SF_DIR).collect()]
    assert len(set(bf) & set(lsh)) / 10 >= 0.3


def test_ngram_jaccard_large_vocab_fallback(spark, tmp_path):
    """The r6 bitmask verify only fires when the corpus vocabulary fits in
    63 words; a larger vocabulary must take the array_intersect fallback
    and still produce the exact naive-join result."""
    import itertools
    from pyspark.sql import functions as F
    from symspark.plans import queries as Q

    # 80-word vocabulary (> 63) over a handful of near-duplicate docs
    vocab = [f"w{i:02d}" for i in range(80)]
    rows = []
    for doc_id in range(40):
        base = doc_id % 8
        words = vocab[base * 10 : base * 10 + 10]
        if doc_id % 2:  # near-dup: drop one word -> jaccard 9/10
            words = words[:-1]
        rows.append((doc_id, "en", "s", " ".join(words), len(" ".join(words))))
    sdf = spark.createDataFrame(
        rows, "doc_id long, lang string, source string, text string, n_chars long"
    )
    d = str(tmp_path)
    sdf.coalesce(1).write.mode("overwrite").parquet(f"{d}/documents.parquet")

    got = {
        (r.doc_a, r.doc_b): r.jacc
        for r in Q.SPARK_QUERIES["dedup_ngram_jaccard"](spark, d).collect()
    }
    Q.release_caches()

    # naive expected: all same-block pairs with word-set jaccard >= 0.8
    expected = {}
    docs = {r[0]: set(r[3].split(" ")) for r in rows}
    for a, b in itertools.combinations(sorted(docs), 2):
        inter = len(docs[a] & docs[b])
        jacc = inter / (len(docs[a]) + len(docs[b]) - inter)
        if jacc >= 0.8:
            expected[(a, b)] = round(jacc, 4)
    assert got == expected and expected  # non-empty, exact


def test_ann_lsh_topk_radius_guard(spark):
    """The r6 enumerated multiprobe only covers Hamming radius <= 1; a
    larger radius must fail loudly instead of silently under-probing."""
    import pytest as _pytest
    from symspark.plans import queries as Q

    with _pytest.raises(ValueError):
        Q._ann_lsh_topk_impl(spark, SF_DIR, n_planes=4, radius=2)
