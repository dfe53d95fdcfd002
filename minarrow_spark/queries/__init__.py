"""Query modules — importing this package registers every query.

Module map (→ SURVEY.md §2 sections):
* relational  — scans, filters, joins, aggregations, set ops, sorts
  (S8, P1-P9, J1-J7, A1-A12, U1-U5, O1-O4)
* windows     — SQL window functions (W1-W4)
* funcs       — scalar function suites: strings (T1-T20), datetimes (D1-D12),
  arithmetic semantics (M1-M9)
* textops     — text analysis for training-data pipelines (tokenize, lang-id,
  quality, fingerprint)
* dedup       — exact + near-duplicate detection (minhash-LSH, simhash,
  n-gram jaccard)
* similarity  — embedding similarity search (brute-force cosine top-k, LSH)
* eventflow   — event-time windowing / sessionization (batch forms of ST1-ST7)
"""

# Import order IS driver registration/run order. Deliberate, not alphabetical:
# the window tier runs first (round 1's driver run was cut off before it),
# the broadest-coverage modules next, and the most expensive pipelines
# (minhash/LSH dedup) last — so a driver-side query/time budget cuts the
# costliest re-verifications, never an operator family's only hard signal.
from minarrow_spark.queries import (  # noqa: F401
    windows,
    relational,
    funcs,
    textops,
    eventflow,
    multimodal,
    similarity,
    dedup,
)
