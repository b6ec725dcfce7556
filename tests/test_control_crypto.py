"""P9 crypto serde-chain stages, K8 DLQ re-key, and the heartbeat
listener control plane."""

import json
import os

import pytest
from pyspark.sql import functions as F

from openmsistream_spark.functions.crypto import (
    clear_cipher,
    decrypt_messages,
    encrypt_column,
    encrypt_messages,
    set_cipher,
)


@pytest.fixture(autouse=True)
def _reset_cipher():
    yield
    clear_cipher()


def _toy_cipher():
    # NOT cryptography — a reversible byte transform proving the chain
    # plumbing (real deployments register KafkaCrypto/Fernet here).
    def enc(b: bytes) -> bytes:
        return b"ENC1" + bytes(x ^ 0x5A for x in b)

    def dec(b: bytes) -> bytes:
        if not b.startswith(b"ENC1"):
            raise ValueError("not an ENC1 ciphertext")
        return bytes(x ^ 0x5A for x in b[4:])

    return enc, dec


def test_crypto_chain_roundtrip(spark):
    set_cipher(*_toy_cipher())
    msgs = spark.createDataFrame(
        [(b"k1", b"payload-one"), (b"k2", b"payload-two")], "key binary, value binary"
    )
    enc = encrypt_messages(msgs)
    assert all(bytes(r.value).startswith(b"ENC1") for r in enc.collect())
    dec = decrypt_messages(enc)
    got = {bytes(r.key): bytes(r.value) for r in dec.collect()}
    assert got == {b"k1": b"payload-one", b"k2": b"payload-two"}
    assert all(r.decrypt_error is None for r in dec.collect())


def test_undecryptable_routes_to_dlq_or_plaintext(spark):
    set_cipher(*_toy_cipher())
    msgs = spark.createDataFrame(
        [(b"good", b"ENC1" + bytes(x ^ 0x5A for x in b"hi")), (b"bad", b"garbage")],
        "key binary, value binary",
    )
    dec = decrypt_messages(msgs)
    rows = {bytes(r.key): r for r in dec.collect()}
    assert bytes(rows[b"good"].value) == b"hi"
    assert rows[b"bad"].value is None
    assert "ENC1" in rows[b"bad"].decrypt_error
    # the reference's treat_undecryptable_as_plaintext fallback
    dec2 = decrypt_messages(msgs, treat_undecryptable_as_plaintext=True)
    rows2 = {bytes(r.key): r for r in dec2.collect()}
    assert bytes(rows2[b"bad"].value) == b"garbage"
    assert rows2[b"bad"].decrypt_error is None


def test_no_cipher_is_identity_unless_strict(spark):
    df = spark.createDataFrame([(b"v",)], "value binary")
    out = df.withColumn("enc", encrypt_column("value")).collect()[0]
    assert bytes(out.enc) == b"v"
    with pytest.raises(NotImplementedError, match="set_cipher"):
        encrypt_column("value", strict=True)


def test_reproduce_dlq_rekeys_messages(spark, tmp_path):
    from openmsistream_spark.pipelines import read_topic, reproduce_dlq

    dlq_dir = str(tmp_path / "dlq")
    topic = str(tmp_path / "topic_rekey")
    spark.createDataFrame(
        [(b"k0", b"raw0", "boom"), (b"k1", b"raw1", "boom2")],
        "key binary, value binary, deser_error string",
    ).write.parquet(dlq_dir)
    n = reproduce_dlq(spark, dlq_dir, topic)
    assert n == 2
    got = {bytes(r.key): bytes(r.value) for r in read_topic(spark, topic).collect()}
    assert got == {b"k0": b"raw0", b"k1": b"raw1"}


def test_heartbeat_listener(spark, tmp_path):
    from openmsistream_spark.streaming.control import attach_heartbeats

    emitted = []
    listener = attach_heartbeats(
        spark, "prog1", emit=lambda k, v: emitted.append((k, v))
    )
    try:
        src_dir = str(tmp_path / "hb_in")
        spark.range(100).select(F.col("id")).write.parquet(src_dir)
        q = (
            spark.readStream.schema("id long")
            .parquet(src_dir)
            .writeStream.format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(60)
        # listener callbacks are async — wait briefly for delivery
        import time

        for _ in range(50):
            if listener.beats:
                break
            time.sleep(0.2)
        assert listener.beats, "no heartbeat received"
        beat = listener.beats[0]
        assert beat["n_messages_read"] == 100
        key, val = emitted[0]
        assert key == "prog1_heartbeat"
        assert json.loads(val)["n_messages_read"] == 100
    finally:
        spark.streams.removeListener(listener)
