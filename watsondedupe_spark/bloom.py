"""Per-part Bloom-filter sidecars for manifest-level data skipping.

Min/max span stats (``store.SKIP_STATS_COLS``) prune parts well for
range-clustered keys but are useless for uniform hash keys: every
non-trivial part of ``chunks``/``chunk_store`` spans essentially the
whole urlsafe-b64 SHA-256 keyspace, so a point probe must plan a scan
over every live part (``store.HASH_KEYED`` documents exactly this).
The per-part Bloom sidecar closes that gap the same way Iceberg puffin
blobs / parquet file-level bloom filters do, one level higher: at
part-write time the driver reads back ONLY the key column (a columnar
single-column read of the part it just wrote) and records a bitmap in
``{part}/_BLOOM.{col}`` (the ``_`` prefix keeps Spark's file listing
and pyarrow's dataset discovery from treating it as data). Point reads
then test their probe keys against each part's bitmap and drop parts
that definitely lack every probe — BEFORE Spark plans a scan.

At 100 TB this is the difference between "a ``get()`` payload fetch
plans a scan over every live payload part" and "it opens the 1-2 parts
that can actually contain the object's chunks"; a negative ``exists()``
becomes a manifest-plus-sidecar check that plans no scan at all — the
b-tree-miss fast path of the reference's PK index
(src/DedupeLibrary/Database/SqliteProvider.cs:258-270), re-expressed as
file skipping.

Correctness posture: the sidecar is an optimization, never a gate. A
part without a readable sidecar is always scanned, a false positive
only widens the scan, and the hash derivation is deterministic per
VALUE and shared verbatim by build and probe, so false negatives are
impossible by construction.

Hashing: chunk keys are urlsafe-b64 SHA-256 (``keys.py:28``) — the key
characters ARE uniform entropy, so the two double-hashing bases come
from vectorized polynomials over the 6-bit symbol values of the two
disjoint halves of the key (no per-key Python hashing in the common
path). Values that are not 43-byte urlsafe-b64 (object keys are
arbitrary user strings) take a vectorized variable-length byte
polynomial (r13 — this was a per-value BLAKE2b Python loop, a
row-at-a-time stall inside every big fold's sidecar build); the
fast/slow choice is made per value, so mixed probe sets stay
consistent with mixed builds. The magic is bumped (WBLM2) so sidecars
written by the BLAKE2b version parse-fail and fall back to a full
scan — a stale sidecar must never become a false negative.
"""

from __future__ import annotations

import struct

import numpy as np

_MAGIC = b"WBLM2"
_HEADER = struct.Struct("<BQQ")  # k, m (bits), n (keys)

#: sizing: ~16 bits/key with k=8 probes -> false-positive rate ~6e-4
BITS_PER_KEY = 16
K = 8
#: bitmap cap (bits): 16 MiB of bitmap; parts beyond ~8M keys keep a
#: correct filter with a gracefully degrading FP rate
MAX_BITS = 1 << 27

#: full-period odd multiplier (2^64 / phi) for the polynomial hashes
_MULT = 0x9E3779B97F4A7C15

# 6-bit symbol values for the urlsafe-b64 alphabet; 255 marks a byte
# outside the alphabet (forces the BLAKE2b fallback for that value)
_LUT = np.full(256, 255, dtype=np.uint8)
for _i, _ch in enumerate(
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789-_"
):
    _LUT[ord(_ch)] = _i

# per-position multiplier powers for the two key halves (mod 2^64)
_POW1 = np.array([pow(_MULT, i, 1 << 64) for i in range(21)], dtype=np.uint64)
_POW2 = np.array([pow(_MULT, i, 1 << 64) for i in range(22)], dtype=np.uint64)

# slow-path (arbitrary-length values) polynomial constants: a second
# full-period odd multiplier (xxhash64 prime) decorrelates h2 from h1,
# and the length terms keep "ab"+pad distinct from "ab\0"
_MULT2 = 0xC2B2AE3D27D4EB4F
_LEN1 = np.uint64(0xFF51AFD7ED558CCD)
_LEN2 = np.uint64(0xC4CEB9FE1A85EC53)
_SPOW1 = _POW1.copy()
_SPOW2 = np.array([pow(_MULT2, i, 1 << 64) for i in range(22)], dtype=np.uint64)


def _slow_pows(maxlen: int) -> "tuple[np.ndarray, np.ndarray]":
    """Grow the cached per-position power tables to ``maxlen``."""
    global _SPOW1, _SPOW2
    if len(_SPOW1) < maxlen:
        _SPOW1 = np.array(
            [pow(_MULT, i, 1 << 64) for i in range(maxlen)], dtype=np.uint64
        )
    if len(_SPOW2) < maxlen:
        _SPOW2 = np.array(
            [pow(_MULT2, i, 1 << 64) for i in range(maxlen)], dtype=np.uint64
        )
    return _SPOW1, _SPOW2


def _slow_hashes_flat(
    flat: "np.ndarray", offs: "np.ndarray"
) -> "tuple[np.ndarray, np.ndarray]":
    """Vectorized double-hashing bases for arbitrary-length byte
    values, given the concatenated bytes and int64 offsets (the arrow
    string-buffer layout): two byte-polynomials with independent
    multipliers plus a length term. One weighted pass over the flat
    buffer + a segment sum (``np.add.reduceat``) — O(total bytes), no
    per-value Python, no padded matrix. A value's hash depends only on
    its own bytes and length, so it is per-VALUE deterministic like
    the fast path. Replaces a per-value BLAKE2b Python loop (r13,
    guide §4): a Bloom base needs uniformity, not cryptographic
    strength, and the loop was the one row-at-a-time stall left inside
    big folds' sidecar builds."""
    lens = np.diff(offs)
    n = len(lens)
    ul = lens.astype(np.uint64)
    h1 = ul * _LEN1
    h2 = ul * _LEN2
    if len(flat) and n:
        p1, p2 = _slow_pows(int(lens.max()))
        col = np.arange(len(flat), dtype=np.int64) - np.repeat(offs[:-1], lens)
        b = flat.astype(np.uint64) + np.uint64(1)
        # reduceat over NON-EMPTY segments only: empty segments would
        # need duplicate/clipped boundary indices, and np.add.reduceat
        # mis-sums around those (an equal-index pair yields the next
        # value's first term; a clipped final index splits the previous
        # segment). Non-empty starts are strictly increasing and all
        # < len(flat), so the sums are exact; empties keep their pure
        # length term (their polynomial sum is 0).
        nz = lens > 0
        idx = offs[:-1][nz]
        h1[nz] += np.add.reduceat(b * p1[col], idx)
        h2[nz] += np.add.reduceat(b * p2[col], idx)
    return h1, h2


def _slow_hashes(enc: "list[bytes]") -> "tuple[np.ndarray, np.ndarray]":
    """List-of-bytes adapter over :func:`_slow_hashes_flat`."""
    n = len(enc)
    lens = np.fromiter((len(b) for b in enc), dtype=np.int64, count=n)
    offs = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(lens, out=offs[1:])
    flat = np.frombuffer(b"".join(enc), dtype=np.uint8)
    return _slow_hashes_flat(flat, offs)


def hash_pairs(values: list) -> "tuple[np.ndarray, np.ndarray]":
    """Two uint64 double-hashing bases per value.

    Deterministic per value (NOT per batch): a 43-byte urlsafe-b64
    value always takes the vectorized polynomial path, anything else
    always takes BLAKE2b — so a probe set mixing both kinds tests
    consistently against a part built from either.
    """
    n = len(values)
    h1 = np.zeros(n, dtype=np.uint64)
    h2 = np.zeros(n, dtype=np.uint64)
    enc: list[bytes] = []
    fast: list[int] = []
    slow: list[int] = []
    for i, v in enumerate(values):
        b = v.encode("utf-8", "surrogatepass")
        enc.append(b)
        (fast if len(b) == 43 else slow).append(i)
    if fast:
        mat = np.frombuffer(b"".join(enc[i] for i in fast), dtype=np.uint8)
        mat = mat.reshape(-1, 43)
        fa = np.asarray(fast)
        # column-wise accumulation, deliberately allocation-lean: the
        # obvious (n, 21)-matrix form materializes ~170 bytes/key of
        # uint64 temporaries, and big numpy temps go back to the OS on
        # free — on lazily-backed VMs every call then re-faults hundreds
        # of MB at disk speed (measured 20s+ for a 3M-key part where the
        # warm-page cost is 0.2s). Per-column temps stay ~8 bytes/key.
        # uint64 arithmetic wraps mod 2^64 — exactly the ring we want.
        f1 = np.zeros(len(fa), dtype=np.uint64)
        f2 = np.zeros(len(fa), dtype=np.uint64)
        bad = np.zeros(len(fa), dtype=bool)
        for i in range(43):
            s = _LUT[mat[:, i]]
            bad |= s == 255
            if i < 21:
                f1 += s.astype(np.uint64) * _POW1[i]
            else:
                f2 += s.astype(np.uint64) * _POW2[i - 21]
        h1[fa] = f1
        h2[fa] = f2
        # 43-byte values containing non-alphabet bytes: fallback path
        slow.extend(int(i) for i in fa[bad])
    if slow:
        s1, s2 = _slow_hashes([enc[i] for i in slow])
        si = np.asarray(slow)
        h1[si] = s1
        h2[si] = s2
    # odd step => the k probes hit k distinct positions mod a power of two
    h2 |= np.uint64(1)
    return h1, h2


def _hash_pairs_arrow(arr):
    """Zero-copy :func:`hash_pairs` over a pyarrow string array: hash
    straight off the arrow value buffer — no to_pylist, no per-value
    Python encode. Returns None only for nulls/empty/non-string arrays
    (caller falls back to the list path). The per-value fast/slow rule
    is the list path's verbatim: exactly-43-utf-8-byte values made of
    the urlsafe-b64 alphabet take the split-halves polynomial,
    everything else the variable-length polynomial — identical output
    to ``hash_pairs(arr.to_pylist())`` by construction (arrow stores
    utf-8 bytes, and 43 ascii alphabet bytes encode to themselves).
    r13: variable-length columns (object keys) used to bail to the
    to_pylist + per-value-BLAKE2b path; now they ride the same flat
    buffer through the vectorized slow polynomial."""
    import pyarrow as pa

    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    if arr.null_count or len(arr) == 0:
        return None
    if pa.types.is_large_string(arr.type):
        off_dtype = np.int64
    elif pa.types.is_string(arr.type):
        off_dtype = np.int32
    else:
        return None
    bufs = arr.buffers()
    offsets = np.frombuffer(
        bufs[1], dtype=off_dtype, count=len(arr) + 1 + arr.offset
    )[arr.offset :]
    n = len(arr)
    flat = np.frombuffer(bufs[2], dtype=np.uint8)[offsets[0] : offsets[-1]]
    offs = (offsets - offsets[0]).astype(np.int64)
    widths = np.diff(offs)
    uniform43 = offs[-1] == 43 * n and bool((widths == 43).all())
    if uniform43:
        h1 = np.zeros(n, dtype=np.uint64)
        h2 = np.zeros(n, dtype=np.uint64)
        f = np.arange(n)
        mat = flat.reshape(-1, 43)
    else:
        h1, h2 = _slow_hashes_flat(flat, offs)
        f = np.flatnonzero(widths == 43)
        if len(f):
            take = (offs[f][:, None] + np.arange(43, dtype=np.int64)).ravel()
            mat = flat[take].reshape(-1, 43)
        else:
            mat = None
    if mat is not None and len(f):
        f1 = np.zeros(len(f), dtype=np.uint64)
        f2 = np.zeros(len(f), dtype=np.uint64)
        bad = np.zeros(len(f), dtype=bool)
        for i in range(43):
            s = _LUT[mat[:, i]]
            bad |= s == 255
            if i < 21:
                f1 += s.astype(np.uint64) * _POW1[i]
            else:
                f2 += s.astype(np.uint64) * _POW2[i - 21]
        good = ~bad
        h1[f[good]] = f1[good]
        h2[f[good]] = f2[good]
        if uniform43 and bad.any():
            # 43-byte values with non-alphabet bytes: slow rule
            bi = f[bad]
            b1, b2 = _slow_hashes(
                [bytes(flat[offs[i] : offs[i + 1]]) for i in bi]
            )
            h1[bi] = b1
            h2[bi] = b2
    h2 |= np.uint64(1)
    return h1, h2


def build_arrow(arr) -> bytes:
    """:func:`build` from a pyarrow string column (nulls dropped by the
    caller) — rides the zero-copy hash path when the values fit the
    43-byte chunk-key shape, else falls back to the list path."""
    hashed = _hash_pairs_arrow(arr)
    if hashed is None:
        return build(arr.to_pylist())
    return _build_from_hashes(len(arr), *hashed)


def _probe_bits(h1, h2, i: int, m: int):
    """(byte index, bit mask) arrays for probe round ``i``."""
    pos = (h1 + np.uint64(i) * h2) & np.uint64(m - 1)
    return (pos >> np.uint64(3)).astype(np.int64), (
        np.uint8(1) << (pos & np.uint64(7)).astype(np.uint8)
    )


def build(values: list) -> bytes:
    """Serialized sidecar for one part's key column (nulls excluded by
    the caller; a null key never equals a probe value, so pruning a
    part on its non-null keys alone is exact)."""
    if not values:
        return _build_from_hashes(0, None, None)
    return _build_from_hashes(len(values), *hash_pairs(values))


def _build_from_hashes(n: int, h1, h2) -> bytes:
    m = 64
    while m < n * BITS_PER_KEY and m < MAX_BITS:
        m <<= 1
    if n:
        # vectorized bit set: boolean scatter (duplicate indices are
        # fine for assignment) + packbits — orders of magnitude faster
        # than a scattered read-modify-write per probe
        bits = np.zeros(m, dtype=bool)
        mask = np.uint64(m - 1)
        for i in range(K):
            bits[(h1 + np.uint64(i) * h2) & mask] = True
        buf = np.packbits(bits, bitorder="little")
    else:
        buf = np.zeros(m >> 3, dtype=np.uint8)
    return _MAGIC + _HEADER.pack(K, m, n) + buf.tobytes()


def parse(raw: bytes) -> "tuple[int, int, np.ndarray]":
    """``(k, m, bitmap)`` from sidecar bytes; raises on any malformed
    input (callers treat that as "no sidecar — never prune")."""
    if not raw.startswith(_MAGIC):
        raise ValueError("bad bloom sidecar magic")
    k, m, _n = _HEADER.unpack_from(raw, len(_MAGIC))
    buf = np.frombuffer(raw, dtype=np.uint8, offset=len(_MAGIC) + _HEADER.size)
    if not k or m & (m - 1) or m < 8 or len(buf) != m >> 3:
        raise ValueError("bad bloom sidecar geometry")
    return k, m, buf


def might_contain_any(parsed, h1, h2) -> bool:
    """True when the part MAY contain at least one of the hashed probe
    values (false positives possible, false negatives impossible)."""
    k, m, buf = parsed
    ok = np.ones(len(h1), dtype=bool)
    for i in range(k):
        idx, bit = _probe_bits(h1, h2, i, m)
        ok &= (buf[idx] & bit) != 0
        if not ok.any():
            return False
    return True
