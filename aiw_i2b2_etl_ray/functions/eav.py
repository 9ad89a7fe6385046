"""EAV value typing — the i2b2 ``valtype_cd``/``tval_char``/``nval_num``
triplet dispatch.

Reference: dest/table/AbstractFactHandler.java:64-90 and the code enums
ValTypeCode.java / TValCharWhenNumberCode.java:30-55 in /root/reference.
Semantics reproduced vectorized:

    null value            -> valtype '@', tval null,         nval null
    numeric               -> valtype 'N', tval 'E',          nval value
    inequality numeric    -> valtype 'N', tval comparator    nval value
                             (E/NE/L/LE/G/GE)
    anything else (text)  -> valtype 'T', tval str[:255],    nval null

The engine's change-event payloads are strings, so the CDC core uses only
the 'T'/'@' arms; the full dispatch is kept as a first-class function for
parity and is exercised by the ``q_eav_encode`` query.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: comparator -> tval_char code (TValCharWhenNumberCode.java:30-55)
COMPARATOR_CODES = {"=": "E", "!=": "NE", "<": "L", "<=": "LE", ">": "G", ">=": "GE"}

TVAL_MAX = 255  # AbstractFactHandler.java:83-86 truncation width


def encode_numeric(num: pa.Array | pa.ChunkedArray, comparator=None) -> pa.Table:
    """Numeric (optionally inequality) values -> EAV triplet columns."""
    n = len(num)
    is_null = pc.is_null(num)
    valtype = pc.if_else(is_null, pa.scalar("@"), pa.scalar("N"))
    if comparator is None:
        tval = pc.if_else(is_null, pa.scalar(None, pa.string()), pa.scalar("E"))
    else:
        comp = pc.coalesce(comparator, pa.scalar("="))
        tval = pa.scalar(None, pa.string())
        mapped = comp
        for sym, code in COMPARATOR_CODES.items():
            mapped = pc.if_else(pc.equal(comp, sym), code, mapped)
        tval = pc.if_else(is_null, pa.scalar(None, pa.string()), mapped)
    return pa.table(
        {
            "valtype_cd": valtype,
            "tval_char": tval,
            "nval_num": pc.cast(num, pa.float64()),
        }
    )


def encode_text(text: pa.Array | pa.ChunkedArray) -> pa.Table:
    """Text values -> ('T', str[:255], null); null -> ('@', null, null)."""
    is_null = pc.is_null(text)
    return pa.table(
        {
            "valtype_cd": pc.if_else(is_null, pa.scalar("@"), pa.scalar("T")),
            "tval_char": pc.utf8_slice_codeunits(text, 0, TVAL_MAX),
            "nval_num": pa.nulls(len(text), pa.float64()),
        }
    )
