"""Headline-number drift gate (VERDICT r4 weak #3 — third drift finding
in a row): NUMBERS.json is the single source of truth for the headline
performance figures; README.md and BASELINE.md must quote those exact
values. A kernel change that moves a measurement updates NUMBERS.json
first, then the prose — this test turns silent drift into a failure.
"""

import json
import pathlib

ROOT = pathlib.Path(__file__).resolve().parent.parent


def _load():
    numbers = json.loads((ROOT / "NUMBERS.json").read_text())
    readme = (ROOT / "README.md").read_text()
    baseline = (ROOT / "BASELINE.md").read_text()
    return numbers, readme, baseline


def test_bc7_headlines_quoted_consistently():
    numbers, readme, baseline = _load()
    default = f"{numbers['bc7_default_mt_s']:.1f}"
    maxq = f"{numbers['bc7_maxq_mt_s']:.1f}"
    for doc, name in ((readme, "README.md"), (baseline, "BASELINE.md")):
        assert f"{default} M" in doc, \
            f"{name} does not quote the BC7 default tier {default} M"
        assert f"{maxq} M" in doc, \
            f"{name} does not quote the BC7 maxq tier {maxq} M"


def test_bc6h_headlines_quoted_consistently():
    numbers, readme, baseline = _load()
    default = f"{numbers['bc6h_default_mt_s']:.1f}"
    mid = f"{numbers['bc6h_mid_mt_s']:.1f}"
    maxq = f"{numbers['bc6h_maxq_mt_s']:.1f}"
    for doc, name in ((readme, "README.md"), (baseline, "BASELINE.md")):
        assert f"{default} M" in doc, \
            f"{name} does not quote the BC6H default tier {default} M"
        assert f"{mid} M" in doc, \
            f"{name} does not quote the BC6H mid tier {mid} M"
        assert f"{maxq} M" in doc, \
            f"{name} does not quote the BC6H maxq tier {maxq} M"


def test_fixed_function_codec_rates_quoted():
    numbers, readme, baseline = _load()
    for key, label in (("bc1_encode_gt_s", "BC1"),
                       ("bc3_encode_gt_s", "BC3"),
                       ("bc4_encode_gt_s", "BC4"),
                       ("bc5_encode_gt_s", "BC5")):
        val = f"{numbers[key]:.2f}"
        assert val in readme, f"README.md missing {label} rate {val}"
        assert val in baseline, f"BASELINE.md missing {label} rate {val}"


def test_no_retired_maxq_figure():
    """The retired FULLx2 maxq figure (132.3 / '132 M') must not be
    presented as current anywhere (VERDICT r4 weak #3)."""
    _, readme, _ = _load()
    assert "132 M" not in readme and "132.3 M" not in readme
