"""Static driver-contract guards (no Ray execution): every oracle has
a query, names are unique, and the module exposes the three entry
points the graft driver calls."""

import importlib.util
import os


def _load():
    p = os.path.join(os.path.dirname(__file__), "..", "__ray_entry__.py")
    spec = importlib.util.spec_from_file_location("_entry_contract", p)
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    return m


def test_contract_surface():
    m = _load()
    assert callable(m.entry)
    q = m.queries()
    o = m.oracle_sql()
    assert q and all(callable(f) for f in q.values())
    # every oracle key must be a runnable query (the driver joins on it)
    missing = set(o) - set(q)
    assert not missing, f"oracles without queries: {missing}"
    # oracles are non-empty SQL strings
    assert all(isinstance(s, str) and "SELECT" in s.upper() for s in o.values())
