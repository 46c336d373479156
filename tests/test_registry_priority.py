"""Registry stamping-priority tests (r12, VERDICT r11 item 3): keys whose
operator source changed since their last green stamp must outrank pure
staleness so the driver's ~50-key oracle window re-verifies touched
operators first. No Spark needed — pure ordering logic."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from parallel_map_reduce_word_counter_for_one_machine_spark import registry


def test_changed_class_outranks_staleness():
    """A green key whose module committed after its stamp sorts ahead of a
    staler green key whose module did not change; never-green keys still
    sort first; within the changed class, most-recently-changed first."""
    last = {"stale_unchanged": 3, "changed_old": 7, "changed_new": 9}
    changed = {"changed_old": 100, "changed_new": 200}
    items = sorted(
        ["never_green", "stale_unchanged", "changed_old", "changed_new"],
        key=lambda k: (
            0 if k not in last else (1 if k in changed else 2),
            -changed.get(k, 0),
            last.get(k, -1),
        ),
    )
    assert items == [
        "never_green",
        "changed_new",  # newest module commit first within the class
        "changed_old",
        "stale_unchanged",
    ]


def test_files_changed_after_stamp_live():
    """On the real repo the helper returns a dict keyed by registered query
    names with positive commit times, and never flags a never-green key."""
    registry.load_all()
    last = registry._last_green_round()
    changed = registry._files_changed_after_stamp(last)
    assert isinstance(changed, dict)
    for key, ts in changed.items():
        assert key in registry.QUERIES
        assert key in last  # only green keys can be 'changed since stamp'
        assert ts > 0


def test_prioritize_is_permutation():
    """prioritize() must reorder, never add or drop, registry entries."""
    registry.load_all()
    before = set(registry.QUERIES)
    registry.prioritize()
    assert set(registry.QUERIES) == before
