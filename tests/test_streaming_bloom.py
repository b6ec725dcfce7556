"""Streaming bloom novelty: durable position ledger, equivalence to the
batch bloom scan, exactly-once replay, and the mask-bounded state
guarantee."""

from pyspark.sql import functions as F

from openmsistream_spark.llm.bloom import bloom_build, gram_novelty
from openmsistream_spark.llm.dedup import word_shingles
from openmsistream_spark.operators.registry import make_registry
from openmsistream_spark.streaming.bloom import (
    batch_novelty_against_ledger,
    bloom_novelty_stream_sink,
)

SCHEMA = "doc_id long, text string"
W = " ".join(f"w{i}" for i in range(10))  # 10 words -> 3 distinct 8-grams
BATCHES = [
    [(0, W + " extra0"), (1, "a0 a1 a2 a3 a4 a5 a6 a7 a8")],
    [(2, W), (3, "b0 b1 b2 b3 b4 b5 b6 b7")],  # doc 2's grams all seen in b0
    [(4, "a0 a1 a2 a3 a4 a5 a6 a7 fresh")],
]
M, K, N = 1 << 16, 4, 8


def _run(spark, in_dir, out_dir, ckpt, reg):
    src = spark.readStream.schema(SCHEMA).parquet(f"{in_dir}/b=*")
    q = (
        bloom_novelty_stream_sink(
            src, reg, out_dir, ckpt, n=N, m_bits=M, k=K
        )
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "stream did not finish"


def _out(spark, out_dir):
    return {
        r.doc_id: (r.n_grams, r.n_novel)
        for r in spark.read.parquet(out_dir).collect()
    }


def test_stream_matches_batchwise_bloom(spark, tmp_path):
    """Each streamed batch's verdicts equal gram_novelty against a bloom
    built over all STRICTLY EARLIER batches."""
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    reg = make_registry(spark, str(tmp_path / "pos"), ["pos"])
    seen_rows = []
    want = {}
    for b, rows in enumerate(BATCHES):
        bdf = spark.createDataFrame(rows, SCHEMA)
        if seen_rows:
            ref = word_shingles(
                spark.createDataFrame(seen_rows, SCHEMA), n=N, hashed=True
            )
            bloom = bloom_build(ref.select("shingle"), "shingle", m_bits=M, k=K)
        else:
            from openmsistream_spark.llm.bloom import BloomFilter

            bloom = BloomFilter(m_bits=M, k=K, mask=bytes(M // 8))
        for r in gram_novelty(bdf, bloom, n=N).collect():
            want[r.doc_id] = (r.n_grams, r.n_novel)
        bdf.coalesce(1).write.parquet(f"{in_dir}/b={b}")
        _run(spark, in_dir, out_dir, ckpt, reg)
        seen_rows += rows
    assert _out(spark, out_dir) == want
    # semantics: batch-0 docs are fully novel; doc 2 repeats doc 0's
    # leading grams (all seen); doc 4 shares 1 gram with doc 1
    assert want[0][0] == want[0][1]
    assert want[2] == (3, 0)
    assert want[4] == (2, 1)


def test_replay_is_exactly_once(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    reg = make_registry(spark, str(tmp_path / "pos"), ["pos"])
    for b, rows in enumerate(BATCHES[:2]):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/b={b}"
        )
        _run(spark, in_dir, out_dir, ckpt, reg)
    first = _out(spark, out_dir)
    # replay batch 1 through the pure step with the POST-insert ledger:
    # its own positions are first_batch=1 (not strictly earlier), so the
    # verdicts re-derive byte-identically
    replay = batch_novelty_against_ledger(
        spark.createDataFrame(BATCHES[1], SCHEMA),
        reg.read(),
        1,
        n=N,
        m_bits=M,
        k=K,
    )
    got = {r.doc_id: (r.n_grams, r.n_novel) for r in replay.collect()}
    assert got == {d: first[d] for d in (2, 3)}


def test_ledger_is_mask_bounded_and_attributed(spark, tmp_path):
    in_dir, out_dir, ckpt = (
        str(tmp_path / "in"),
        str(tmp_path / "out"),
        str(tmp_path / "ckpt"),
    )
    reg = make_registry(spark, str(tmp_path / "pos"), ["pos"])
    for b, rows in enumerate(BATCHES):
        spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(
            f"{in_dir}/b={b}"
        )
    _run(spark, in_dir, out_dir, ckpt, reg)
    led = reg.read()
    n = led.count()
    assert n == led.select("pos").distinct().count()  # insert-only keys
    assert n <= M  # state bounded by the mask, not the corpus
    assert led.agg(F.min("pos")).first()[0] >= 0
    assert led.agg(F.max("pos")).first()[0] < M
    # first_batch attribution: batch 1's doc-2 grams repeat batch 0's, so
    # every position doc 2 contributes already belongs to batch 0
    b0 = {r.pos for r in led.filter("first_batch = 0").collect()}
    from openmsistream_spark.streaming.bloom import batch_positions

    d2 = batch_positions(
        spark.createDataFrame([BATCHES[1][0]], SCHEMA), n=N, m_bits=M, k=K
    )
    assert {r.pos for r in d2.collect()} <= b0
