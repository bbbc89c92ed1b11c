"""PARITY.md's measured table must equal the committed bench artifact.

VERDICT r2 next #9 (and the r1/r2 'numbers drift from the artifact'
critique): the table is GENERATED from bench_details.json by
utils/parity_table.py; this test fails if anyone edits the table by hand
or commits a new artifact without regenerating
(`python -m opencv_dlco_tpu.utils.parity_table`).
"""

import json
import os

from opencv_dlco_tpu.utils.parity_table import END, START, generate_table

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_parity_table_matches_artifact():
    with open(os.path.join(ROOT, "bench_details.json")) as f:
        details = json.load(f)
    with open(os.path.join(ROOT, "PARITY.md")) as f:
        text = f.read()
    assert START in text and END in text, (
        "PARITY.md missing the generated bench table block")
    block = text[text.index(START) + len(START):text.index(END)].strip("\n")
    expected = generate_table(details)
    assert block == expected, (
        "PARITY.md bench table drifted from bench_details.json — "
        "run `python -m opencv_dlco_tpu.utils.parity_table`")


def test_parity_table_covers_key_suites():
    """The generator must not silently drop headline suites present in
    the artifact (a missing row would hide a regression)."""
    with open(os.path.join(ROOT, "bench_details.json")) as f:
        details = json.load(f)
    table = generate_table(details)
    for suite, needle in (("pr_sweep", "PR sweep"),
                          ("pj_rda", "PJ-RDA"),
                          ("slam_long", "192-frame"),
                          ("matching", "kNN matching"),
                          ("precision_fpr95", "end-metric gate")):
        if details.get(suite):
            assert needle in table, f"suite {suite} missing from table"
