"""Driver-contract invariants: registry alignment and entry() smoke."""

import sys


def test_registry_alignment():
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    q = E.queries()
    s = E.oracle_sql()
    assert len(q) >= 40
    assert set(s).issubset(set(q)), "oracle keys must be query keys"
    assert all(callable(f) for f in q.values())
    assert all(isinstance(v, str) and "SELECT" in v.upper() for v in s.values())


def test_entry_smoke(ray_session):
    sys.path.insert(0, "/root/repo")
    import __ray_entry__ as E

    res = E.entry()
    df = res.to_pandas()
    assert len(df) > 0
    assert {"host", "date", "location_variance", "hours_of_sleep"}.issubset(df.columns)
