"""String normalization kernels.

Reference parity (file:line in /root/reference/src/main/java/edu/emory/cci/aiw/i2b2etl):
- null/empty -> "@" sentinel + max-length truncation: dest/table/TableUtil.java:62-81,115-128
- source-system code 50-char truncation: dest/metadata/MetadataUtil.java:46-52
- provider full-name assembly "Last, First Middle": dest/table/ProviderDimensionFactory.java:269-286
- hierarchy path assembly ``\\A\\B\\C\\``: dest/metadata/PathSupport.java:84-110
- delimited blob escape+join: dest/table/BlobBuilder.java:34-60
- collision-free concept-code truncation: dest/metadata/conceptid/ConceptCodeBuilder.java:40-62
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

SENTINEL = "@"


def null_to_sentinel(col: pa.Array | pa.ChunkedArray, max_len: int | None = None) -> pa.Array | pa.ChunkedArray:
    """null or empty string -> "@"; optionally truncate to ``max_len`` chars."""
    col = pc.if_else(pc.equal(pc.coalesce(col, pa.scalar("")), ""), SENTINEL, col)
    if max_len is not None:
        col = pc.utf8_slice_codeunits(col, 0, max_len)
    return col


def truncate(col, max_len: int):
    """Plain truncation-to-N (valtype tval 255-char truncate,
    AbstractFactHandler.java:83-86; source-system 50-char, MetadataUtil.java:46-52)."""
    return pc.utf8_slice_codeunits(col, 0, max_len)


def full_name(last, first, middle) -> pa.Array:
    """"Last, First Middle" with graceful omission of missing parts."""
    last = pc.coalesce(last, pa.scalar(""))
    first = pc.coalesce(first, pa.scalar(""))
    middle = pc.coalesce(middle, pa.scalar(""))
    fm = pc.utf8_trim_whitespace(
        pc.binary_join_element_wise(first, middle, " ")
    )
    out = pc.binary_join_element_wise(last, fm, ", ")
    out = pc.if_else(pc.equal(fm, ""), last, out)
    return pc.if_else(pc.equal(last, ""), fm, out)


def hierarchy_path(*components) -> pa.Array:
    r"""Assemble ``\A\B\C\`` i2b2-style metadata paths from components."""
    # unify to string: join kernels reject mixed string/large_string inputs
    parts = [pc.coalesce(pc.cast(c, pa.string()), pa.scalar("")) for c in components]
    joined = parts[0]
    for p in parts[1:]:
        joined = pc.binary_join_element_wise(joined, p, "\\")
    return pc.binary_join_element_wise(pa.scalar(""), joined, pa.scalar(""), "\\")


def blob_join(cols: list, delimiter: str = "|", escape: str = "\\") -> pa.Array:
    """Escape the delimiter in each field, then join (BlobBuilder.java:34-60)."""
    esc = [
        pc.replace_substring(
            pc.replace_substring(pc.coalesce(c, pa.scalar("")), escape, escape + escape),
            delimiter,
            escape + delimiter,
        )
        for c in cols
    ]
    out = esc[0]
    for c in esc[1:]:
        out = pc.binary_join_element_wise(out, c, delimiter)
    return out


def concept_code(prop_id, value=None, *, max_len: int = 50) -> pa.Array:
    """propId[:value] concept code with hash-suffix collision-free truncation.

    The reference chops and appends an incrementing numeric suffix
    (ConceptCodeBuilder.java:40-62); a distributed engine can't coordinate a
    counter cheaply, so over-long codes get a stable 8-hex suffix of the
    full code's hash instead — deterministic and collision-resistant.
    """
    code = prop_id if value is None else pc.binary_join_element_wise(prop_id, value, ":")
    too_long = pc.greater(pc.utf8_length(code), max_len)
    import polars as pl

    h = pc.cast(
        pl.from_arrow(pa.table({"c": code}))["c"]
        .hash(seed=7)
        .map_elements(lambda x: format(x & 0xFFFFFFFF, "08x"), return_dtype=pl.String)
        .to_arrow(),
        pa.string(),
    )
    chopped = pc.binary_join_element_wise(
        pc.utf8_slice_codeunits(code, 0, max_len - 9), h, "_"
    )
    return pc.if_else(too_long, chopped, code)
