"""P32 coverage gate (VERDICT r5 item 6): the engine-owned builtins dim
must keep >=99% coverage of the reference's linked-name key set, and the
only admissible misses are the six known junk identifiers in the reference
table (non-builtin helper names that should never doc-link).

Runs without Spark — a pure set comparison over the loaded dim
(``all_builtin_names()``, the union ``builtins_dim`` actually joins).
"""

import json
import os

import pytest

REF_TABLE = "/root/reference/src/maxx/matlab_builtins.json"

# deliberately excluded: junk identifiers in the reference table that are
# not MATLAB builtins (adjudicated in VERDICT r4/r5 — linking them would be
# wrong, not incomplete)
KNOWN_JUNK = {
    "digest",
    "getTimeStr",
    "openedFiles",
    "output",
    "patchdemoxmlfile",
    "propertyInfo",
}


@pytest.mark.skipif(not os.path.exists(REF_TABLE), reason="reference table absent")
def test_builtins_dim_coverage():
    from maxx_spark.operators.builtins import all_builtin_names

    mine = set(all_builtin_names())
    with open(REF_TABLE) as fh:
        ref = set(json.load(fh).keys())
    overlap_pct = 100.0 * len(mine & ref) / len(ref)
    assert overlap_pct >= 99.0, f"builtins dim coverage regressed: {overlap_pct:.2f}%"
    missing = ref - mine
    assert missing <= KNOWN_JUNK, f"new missing reference keys: {sorted(missing - KNOWN_JUNK)}"
