"""Per-file key bloom filters: point-lookup FILE skipping.

Bucket pruning already cuts a lookup to 1/num_buckets of the table;
within a bucket, though, every base/delta/tombstone file must still be
scanned. At CDC steady state a bucket accumulates many delta files and
a key usually lives in few of them — per-file blooms over the primary
key let `LakeTable.lookup` drop files that provably cannot contain the
key (Iceberg puffin-blob / parquet-bloom analog, kept table-side so
the skip happens at FILE granularity before any Spark scan starts).

Hashing stays ENTIRELY JVM-side: the two 64-bit limbs feeding the
double-hashing scheme are `xxhash64(key_cols)` and
`xxhash64(lit(1), key_cols)`, computed by Spark on both the build path
(column-pruned scan + groupBy input_file_name; pandas only sets bits,
vectorized) and the probe path (the same 1-row job `lookup` already
runs for its bucket id). False negatives are impossible — both sides
evaluate the identical expression — and any hash-collision class only
inflates the false-positive rate, which costs one extra file read.

Sidecars are content-deterministic functions of immutable data files,
so they need no versioning or commit protocol: existence == usable,
missing == conservative full read. Built by `LakeTable.build_blooms`,
swept by `vacuum` when the data file is gone.

Scale: 10 bits/key + 7 probes ≈ 0.8% false-positive rate; a 1M-row
128 MB parquet file costs a 1.25 MB sidecar (~1% overhead) and a
lookup consults only the target bucket's sidecars.
"""

from __future__ import annotations

import hashlib
import os
import struct

import numpy as np

_MAGIC = b"LBF1"
BLOOM_SEED = 1  # second-limb xxhash64 seed literal


def bloom_hash_cols(key_cols: list[str]):
    """The two JVM-side limb expressions. ORDER of key_cols must match
    between build and probe (both use the snapshot's key_cols list)."""
    from pyspark.sql import functions as F

    cols = [F.col(c) for c in key_cols]
    return (
        F.xxhash64(*cols).alias("__bh1"),
        F.xxhash64(F.lit(BLOOM_SEED), *cols).alias("__bh2"),
    )


def _positions(h1: np.ndarray, h2: np.ndarray, k: int, n_bits: int) -> np.ndarray:
    """(n, k) bit positions via double hashing. int64 wraparound + a
    floored mod — any deterministic map works as long as the build and
    probe sides agree (both call THIS function on the same JVM-computed
    limbs), and int64 avoids numpy's slow uint64 modulo path."""
    a1 = np.asarray(h1, dtype=np.int64)[:, None]
    a2 = (np.asarray(h2, dtype=np.int64) | np.int64(1))[:, None]
    j = np.arange(k, dtype=np.int64)[None, :]
    with np.errstate(over="ignore"):
        mixed = a1 + j * a2
    return mixed % np.int64(max(n_bits, 1))


class FileBloom:
    """Classic bloom; limbs come in as int64 xxhash64 values."""

    def __init__(self, bits: np.ndarray, n_bits: int, k: int):
        self.bits = bits  # packed uint8, little bit order within bytes
        self.n_bits = n_bits
        self.k = k

    @classmethod
    def build(
        cls, h1: np.ndarray, h2: np.ndarray, bits_per_key: int = 10, k: int = 7
    ) -> "FileBloom":
        n_bits = max(64, len(h1) * int(bits_per_key))
        pos = _positions(np.asarray(h1), np.asarray(h2), k, n_bits).ravel()
        flags = np.zeros(((n_bits + 7) // 8) * 8, dtype=bool)
        flags[pos] = True  # fancy assignment absorbs duplicates cheaply
        bits = np.packbits(flags, bitorder="little")
        return cls(bits, n_bits, k)

    def might_contain(self, h1: int, h2: int) -> bool:
        pos = _positions(np.array([h1]), np.array([h2]), self.k, self.n_bits).ravel()
        byte = self.bits[pos // 8]
        mask = np.left_shift(np.uint8(1), (pos % 8).astype(np.uint8))
        return bool(np.all(byte & mask))

    def to_bytes(self) -> bytes:
        return _MAGIC + struct.pack("<IB", self.n_bits, self.k) + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, raw: bytes) -> "FileBloom":
        if raw[:4] != _MAGIC:
            raise ValueError("not a bloom sidecar")
        n_bits, k = struct.unpack_from("<IB", raw, 4)
        bits = np.frombuffer(raw[9:], dtype=np.uint8)
        if bits.size != (n_bits + 7) // 8:
            raise ValueError("truncated bloom sidecar")
        return cls(bits, n_bits, k)


def sidecar_name(data_file: str) -> str:
    """Stable sidecar filename for a data file path. Hash of the
    table-relative tail so the mapping survives table relocation."""
    tail = "/".join(data_file.rstrip("/").split("/")[-3:])
    return hashlib.sha1(tail.encode()).hexdigest() + ".bloom"


def write_sidecar(bloom_dir: str, data_file: str, blob: bytes) -> None:
    """Atomic, idempotent publish (content is deterministic per file,
    so concurrent builders racing on the same sidecar are harmless)."""
    os.makedirs(bloom_dir, exist_ok=True)
    dst = os.path.join(bloom_dir, sidecar_name(data_file))
    tmp = dst + f".tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, dst)


def load_sidecar(bloom_dir: str, data_file: str) -> FileBloom | None:
    p = os.path.join(bloom_dir, sidecar_name(data_file))
    try:
        with open(p, "rb") as f:
            return FileBloom.from_bytes(f.read())
    except (FileNotFoundError, ValueError):
        return None  # missing/corrupt sidecar -> conservative read
