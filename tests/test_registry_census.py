"""The registry-comment census must equal len(queries()).

VERDICT r13 what's-wrong #2: SCALE.md and the registry comment quoted a
census (230) that didn't match the actual registry (233) because the
comment was hand-edited before late-round registrations landed. This
test makes the drift impossible to commit: the 'Current census: N'
number in the policy comment above _FRONT must be regenerated (or the
comment edited) whenever a query is registered or retired.
"""

import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_registry_comment_census_matches_len_queries():
    import __spark_entry__ as em

    actual = len(em.queries())
    src = open(os.path.join(REPO, "stglib_spark", "queries.py")).read()
    m = re.search(r"Current census: (\d+) registered", src)
    assert m, "policy comment must state 'Current census: N registered'"
    stated = int(m.group(1))
    assert stated == actual, (
        f"registry comment says census {stated} but len(queries()) is "
        f"{actual} — update the 'Current census' line in the policy "
        f"comment above _FRONT (and the cap math if needed)"
    )


def test_registry_under_cap():
    import __spark_entry__ as em

    assert len(em.queries()) <= 250, (
        "registry exceeds the 250-entry cap — retire or merge a "
        "subsumed row in the same round (policy comment above _FRONT)"
    )
