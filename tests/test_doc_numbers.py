"""Docs quote the driver-recorded bench numbers — structurally enforced.

r2–r4 each drifted: README/BASELINE quoted a better builder-side run than
the reproducible `BENCH_r*.json` record (VERDICT r4 weak #1). Convention:
every quoted headline number carries an invisible HTML-comment marker

    <!-- bench:BENCH_r04.json:rays_per_s_b1:k1 -->

naming its source record, key, and display format. This test renders the
expected string from the named JSON and asserts it appears in the visible
text of the same line — a quote that does not match its named source fails
CI, so doc/record drift is impossible without deleting the marker (and the
marker-count floor below catches that).

Formats: `k1` = value/1000 to 1 decimal + "k" (648382.1 → "648.4k");
`f0`/`f1`/`f2` = value rounded to 0/1/2 decimals.
"""
import json
import re
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
MARKER = re.compile(
    r"<!--\s*bench:(BENCH_r\d+\.json):([a-z0-9_]+):(k1|f0|f1|f2)\s*-->")

DOCS = ["README.md", "BASELINE.md"]


def _fmt(value: float, fmt: str) -> str:
    if fmt == "k1":
        return f"{value / 1000:.1f}k"
    nd = int(fmt[1])
    return f"{value:.{nd}f}" if nd else f"{value:.0f}"


def _iter_markers():
    for doc in DOCS:
        text = (REPO / doc).read_text()
        for lineno, line in enumerate(text.splitlines(), 1):
            for m in MARKER.finditer(line):
                yield doc, lineno, line, m


def test_doc_numbers_match_named_bench_records():
    markers = list(_iter_markers())
    # floor: the headline rays/s and SDS it/s quotes in both docs must stay
    # marker-covered (deleting markers to dodge the check fails here)
    assert len(markers) >= 4, (
        f"only {len(markers)} bench markers across {DOCS} — headline "
        "numbers must carry <!-- bench:FILE:KEY:FMT --> markers")
    for doc, lineno, line, m in markers:
        src, key, fmt = m.groups()
        rec = json.loads((REPO / src).read_text())
        rec = rec.get("parsed", rec)
        assert key in rec, f"{doc}:{lineno}: {src} has no key '{key}'"
        expected = _fmt(float(rec[key]), fmt)
        visible = MARKER.sub("", line)
        assert expected in visible, (
            f"{doc}:{lineno}: expected '{expected}' ({src}:{key}) in the "
            f"visible text of the line, got: {visible.strip()!r}")
