import numpy as np
import pytest

from slacken_tpu import native
from slacken_tpu.ops import encode


def make_fastq(records):
    return b"".join(
        b"@" + h + b"\n" + s + b"\n+\n" + b"I" * len(s) + b"\n" for h, s in records
    )


def make_fasta(records, width=60):
    out = []
    for h, s in records:
        out.append(b">" + h + b"\n")
        for i in range(0, len(s), width):
            out.append(s[i : i + width] + b"\n")
    return b"".join(out)


def random_seq(rng, n):
    return bytes(rng.choice(list(b"ACGTacgtN"), n))


def test_native_available():
    assert native.available(), "native library failed to build"


@pytest.mark.parametrize("use_native", [True, False])
def test_fastq_chunk(rng, use_native, monkeypatch):
    if not use_native:
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
    records = [(f"read{i} x".encode(), random_seq(rng, int(rng.integers(50, 120)))) for i in range(30)]
    buf = make_fastq(records)
    # append a partial record (next chunk)
    partial = b"@partial\nACGT"
    packed, consumed = native.pack_fastq_chunk(buf + partial)
    assert consumed == len(buf)
    assert len(packed) == 30
    for i, (h, s) in enumerate(records):
        assert packed.titles[i] == h.decode()
        assert packed.lengths[i] == len(s)
        want = encode.encode_seq(s.decode())
        got = packed.codes[i, : len(s)]
        assert np.array_equal(got, want), f"record {i}"
        assert (packed.codes[i, len(s) :] == 4).all()


@pytest.mark.parametrize("use_native", [True, False])
def test_fasta_buffer(rng, use_native, monkeypatch):
    if not use_native:
        monkeypatch.setattr(native, "_lib", None)
        monkeypatch.setattr(native, "_tried", True)
    records = [(f"seq{i} desc".encode(), random_seq(rng, int(rng.integers(100, 400)))) for i in range(10)]
    buf = make_fasta(records)
    packed = native.pack_fasta_chunk(buf)
    assert len(packed) == 10
    for i, (h, s) in enumerate(records):
        assert packed.titles[i] == h.decode()
        assert packed.lengths[i] == len(s)
        want = encode.encode_seq(s.decode())
        assert np.array_equal(packed.codes[i, : len(s)], want)


def test_encode_bytes(rng):
    data = random_seq(rng, 1000)
    got = native.encode_bytes(data)
    want = encode.encode_seq(data.decode())
    assert np.array_equal(got, want)


def test_native_speed(rng):
    """The native parser should beat a naive python loop comfortably."""
    import time

    records = [(f"r{i}".encode(), random_seq(rng, 101)) for i in range(20000)]
    buf = make_fastq(records)
    t0 = time.time()
    packed, _ = native.pack_fastq_chunk(buf)
    dt = time.time() - t0
    assert len(packed) == 20000
    mbps = len(buf) / dt / 1e6
    print(f"native fastq parse: {mbps:.0f} MB/s")
    assert mbps > 50  # very conservative floor
