"""Doc-consistency checks.

Round-4 verdict: README claimed "233 tests" while the suite had 261 —
stale exact counts in the front-door docs erode evidence hygiene. This
test greps the prose for "<N> tests" claims and compares them against
the count pytest itself collected, so a stale number fails the suite the
day it ships. Only meaningful on a full-suite run; partial runs
(``pytest tests/test_docs.py``) skip rather than false-fail.
"""

import re
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
DOCS = ["README.md", "PARITY.md"]
CLAIM = re.compile(r"(\d{2,4}) tests")


def test_doc_test_counts_match_collected(request):
    collected = len(request.session.items)
    if collected < 200:
        pytest.skip("partial run — doc counts only checked on the full suite")
    for doc in DOCS:
        text = (REPO / doc).read_text()
        for m in CLAIM.finditer(text):
            claimed = int(m.group(1))
            assert claimed == collected, (
                f"{doc} claims '{m.group(0)}' but the suite collects "
                f"{collected} — update the doc")
