"""Golden-image regression tests (SURVEY.md §4 item 3): the oracle render of
each fixture must hash-match the stored golden. Regenerate with
tests/make_goldens.py after INTENTIONAL semantic changes."""

import hashlib
import json
import os

import pytest

from make_goldens import FIXTURES, render_fixture

GOLDENS = json.load(open(os.path.join(os.path.dirname(__file__), "goldens.json")))


@pytest.mark.parametrize("name", FIXTURES)
def test_golden(name):
    data = render_fixture(name)
    digest = hashlib.sha256(data.tobytes()).hexdigest()
    assert digest == GOLDENS[name], (
        f"oracle output of {name!r} changed — if intentional, regenerate "
        f"goldens with tests/make_goldens.py"
    )
