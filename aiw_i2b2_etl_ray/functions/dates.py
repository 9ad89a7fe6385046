"""Date/time kernels — deterministic, clock-free.

The reference leaks wall-clock (importTimestamp, age-vs-now at
dest/table/PatientDimensionFactory.java:200-212); every kernel here takes
an explicit ``as_of`` logical clock instead so replays are reproducible
(the reference's own tests must ignore those columns —
src/test/java/.../ProtempaFactory.java:158).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

#: Logical-clock convention for the CDC tables: commit_seq is rendered as a
#: timestamp by interpreting it as microseconds since the epoch.  This keeps
#: delete_date a real timestamp('us') column (as in the reference's
#: DELETE_DATE staging columns, i2b2-data-schema-changelog.xml:110-139)
#: while staying purely a function of the input.
def seq_to_timestamp(seq: pa.Array | pa.ChunkedArray) -> pa.Array | pa.ChunkedArray:
    return pc.cast(seq, pa.timestamp("us"))


def age_years(birth: pa.Array, as_of: pa.Scalar | pa.Array) -> pa.Array:
    """Whole-year age (PatientDimensionFactory.java:200-212), clock injected."""
    return pc.cast(
        pc.floor(pc.divide(pc.cast(pc.days_between(birth, as_of), pa.float64()), 365.25)),
        pa.int64(),
    )


def length_of_stay(start: pa.Array, end: pa.Array) -> pa.Array:
    """Day distance between visit start/end (VisitDimensionFactory.java:92-96)."""
    return pc.cast(pc.days_between(start, end), pa.int64())


def active_status_code(
    start: pa.Array, end: pa.Array, *, start_gran: str = "day", end_gran: str = "day"
) -> pa.Array:
    """i2b2 ACTIVE_STATUS_CD (ActiveStatusCode.java:47-94): one char for the
    end-date granularity + one for the start-date granularity, with
    presence/absence variants.  Granularity -> code letter per the i2b2
    convention (Y=year M=month D=day H=hour T=minute S=second)."""
    letters = {"year": "Y", "month": "M", "day": "D", "hour": "H", "minute": "T", "second": "S"}
    s_code = letters[start_gran]
    e_code = letters[end_gran]
    has_s = pc.is_valid(start)
    has_e = pc.is_valid(end)
    both = pa.scalar(e_code + s_code)
    only_s = pa.scalar("U" + s_code)  # unknown end
    only_e = pa.scalar(e_code + "L")  # unknown start ("L" = no start date)
    neither = pa.scalar("UL")
    return pc.if_else(
        has_s, pc.if_else(has_e, both, only_s), pc.if_else(has_e, only_e, neither)
    )


def vital_status_code(deceased: pa.Array) -> pa.Array:
    """Nominal/boolean deceased flag -> N/Y/X (VitalStatusCode.java:30-70,
    applied at PatientDimensionFactory.java:155-167): null -> X (unknown)."""
    return pc.if_else(
        pc.is_null(deceased),
        pa.scalar("X"),
        pc.if_else(pc.cast(deceased, pa.bool_()), pa.scalar("Y"), pa.scalar("N")),
    )
