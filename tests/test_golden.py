"""Golden end-to-end pipeline tests — the reference's primary test model
(tenzir/integration/tests.yaml runs `tenzir exec '<pipeline>'` and diffs
stdout against golden files in tenzir/integration/reference/). Here each
case runs a TQL pipeline string over the committed fixtures with the
`to -` NDJSON sink and diffs captured stdout against tests/golden/*.txt.
"""

from __future__ import annotations

import os

import pytest

from tenzir_spark import exec_pipeline

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CONN = "/root/repo/fixtures/conn.log"
CEF = "/root/repo/fixtures/events.cef"

CASES = [
    # tests.yaml:851-857 shape: sort | select | head over zeek-tsv
    ("sort_select_head.txt",
     f"from {CONN} read zeek-tsv | sort uid | select uid proto duration | head 3"),
    ("summarize_by_proto.txt",
     f"from {CONN} read zeek-tsv"
     " | summarize n=count(.), total=sum(duration) by proto | sort proto"),
    ("top_proto.txt",
     f"from {CONN} read zeek-tsv | top proto"),
    ("cef_vendors.txt",
     f"from {CEF} read cef | select device_vendor name | sort name"),
]


@pytest.mark.parametrize("golden,pipeline", CASES, ids=[c[0] for c in CASES])
def test_golden_pipeline(spark, capsys, golden, pipeline):
    exec_pipeline(pipeline + " | to -", spark=spark)
    got = capsys.readouterr().out.strip().splitlines()
    expected = open(os.path.join(GOLDEN_DIR, golden)).read().strip().splitlines()
    assert got == expected, f"{golden}: {got} != {expected}"
