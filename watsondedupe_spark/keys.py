"""Chunk/object key encoding — exact parity with the reference.

Reference semantics (file:line into /root/reference):
- chunk key = URL-safe **unpadded** base64 of raw SHA-256(chunk bytes):
  ``BytesToBase64(Sha256(data))`` strips ``=`` and maps ``/``->``_``,
  ``+``->``-`` (src/DedupeLibrary/DedupeCommon.cs:146-154, 106-111).
- MD5 is used ONLY for boundary detection, never for keys
  (DedupeCommon.cs:114-119; DedupeLibrary.cs:668 vs 674).
- The reference also mutates keys through ``SanitizeString``
  (DedupeCommon.cs:17-95) as SQL-injection armor. We deliberately do NOT
  reproduce that (documented deviation, SURVEY.md §7.3): parameterized
  DataFrame predicates need no injection armor, and key mutation is
  surprising behavior. ``validate_object_key`` enforces the constraints
  instead.
"""

from __future__ import annotations

import base64
import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

MAX_OBJECT_KEY_LEN = 1024  # varchar(1024), DedupeObject.cs:24


def chunk_key(data: bytes) -> str:
    """URL-safe unpadded base64 of SHA-256(data). DedupeCommon.cs:146-154."""
    return base64.urlsafe_b64encode(hashlib.sha256(data).digest()).decode("ascii").rstrip("=")


def chunk_key_col(data_col: Column) -> Column:
    """Columnar (JVM-side) equivalent of :func:`chunk_key`.

    ``sha2`` returns hex, so decode it back to raw bytes with ``unhex``
    before base64 — stays entirely inside whole-stage codegen.
    """
    b64 = F.base64(F.unhex(F.sha2(data_col, 256)))
    return F.translate(F.replace(b64, F.lit("="), F.lit("")), "/+", "_-")


def validate_object_key(key: str) -> str:
    """Reject keys the reference could not store losslessly.

    Mirrors the *intent* of the reference's validation (non-empty,
    varchar(1024) bound, DedupeLibrary.cs:200-201 / DedupeObject.cs:24)
    without the lossy sanitize.
    """
    if not isinstance(key, str) or not key:
        raise ValueError("object key must be a non-empty string")
    if len(key) > MAX_OBJECT_KEY_LEN:
        raise ValueError(f"object key exceeds {MAX_OBJECT_KEY_LEN} chars")
    return key
