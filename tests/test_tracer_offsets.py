"""Tracer-id-offset safety audit (judge ADVICE r8, curation.py:51).

The dedup tracers injected by the wave-85 curation funnel
(plans/curation.py: _EX_OFF / _NR_OFF = 10M / 20M) and by the wave-82
license-header injection (plans/textops.py: _INJ_OFFSET = 10M) assume
every base doc_id sits strictly below the smallest offset. A corpus at
or above 10,000,000 docs would make injected ids collide with real
documents, corrupting funnel counts and dedup-band claims WHILE THE
GATE STAYS GREEN, because the oracle mirrors the same (broken)
transform. Same failure shape as the vec_id demo caps — so the same
guard: every shipped documents fixture must sit strictly inside every
offset, with the margin printed in the failure message so a regenerated
larger fixture fails loudly instead of silently colliding.
"""

from __future__ import annotations

import glob

import pyarrow.parquet as pq

from clinical_data_platform_spark.plans.curation import _EX_OFF, _NR_OFF
from clinical_data_platform_spark.plans.textops import _INJ_OFFSET


def test_every_fixture_inside_every_tracer_offset():
    fixtures = sorted(glob.glob("/root/testdata/sf*/documents.parquet"))
    assert fixtures, "no documents fixtures found"
    offsets = {
        "curation._EX_OFF": _EX_OFF,
        "curation._NR_OFF": _NR_OFF,
        "textops._INJ_OFFSET": _INJ_OFFSET,
    }
    # the near-tracer block must also not collide with the exact-tracer
    # block: max base id + _EX_OFF must stay below _NR_OFF
    assert _EX_OFF < _NR_OFF
    for path in fixtures:
        max_id = max(
            pq.read_table(path, columns=["doc_id"])["doc_id"].to_pylist()
        )
        for name, off in offsets.items():
            assert max_id < off, (
                f"{path}: max doc_id {max_id} >= {name} {off} — injected "
                "tracer ids would collide with real documents and corrupt "
                "funnel/dedup-band counts while the mirrored oracle keeps "
                "the gate green; derive the offsets from max(doc_id)+1 or "
                "shrink the fixture"
            )
        assert max_id + _EX_OFF < _NR_OFF, (
            f"{path}: exact-tracer block [{_EX_OFF}, {_EX_OFF + max_id}] "
            f"would overlap the near-tracer block at {_NR_OFF}"
        )
