"""Canonical value rendering shared by the oracle comparator
(tests/oracle_utils) and the forensics sidecar (minarrow_spark/forensics).

One implementation on purpose: the sidecar's whole value is that its
digests match the comparator's view of the same rows — a hand-maintained
copy would silently diverge the moment canonicalization changes (r6
advisory). Lives in the package (not tests/) because the external driver's
process only has the package on its path.
"""

from __future__ import annotations

import datetime
import math
from decimal import Decimal


def canon_value(v) -> str:
    if v is None:
        return "<NULL>"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == 0.0:
            return "0"  # normalize -0.0
        return repr(v)
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, int):
        return str(v)
    if isinstance(v, (datetime.datetime, datetime.date)):
        return v.isoformat()
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    return str(v)
