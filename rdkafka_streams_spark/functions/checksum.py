"""Order-free content checksums (the anti-entropy primitive of q224/q230).

A row folds to a canonical pipe-joined string; its md5 prefix becomes a
40-bit integer; the per-group SUM of those terms is an order-independent
content fingerprint. Two tables match iff (count, checksum) match per
group, and any difference is localized to the group. 40-bit terms keep a
BIGINT sum overflow-free past 10^7 rows per group; the fold is built from
md5 + string ops only, so any engine computes the identical value (DuckDB
spelling: instr('0123456789abcdef', ...) digit folding — see the q224
oracle).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def content_checksum(cols: Sequence[str | Column], hex_chars: int = 10) -> Column:
    """Per-row checksum term: first ``hex_chars`` md5 hex digits of the
    canonical '|'-joined row string, as a BIGINT. SUM it per group."""
    canon = F.concat_ws(
        "|",
        *[
            (F.col(c) if isinstance(c, str) else c).cast("string")
            for c in cols
        ],
    )
    return F.conv(F.substring(F.md5(canon), 1, hex_chars), 16, 10).cast("bigint")
