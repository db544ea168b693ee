"""load_all failure-atomicity: a failed import must roll back BOTH the
registrations and the sys.modules cache of the registering submodules.
Rolling back only the registry entries leaves the successfully-imported
modules cached, so a retry no-ops their import (register() never runs
again), succeeds, and silently serves a permanently shrunken registry —
the driver check would run a subset of queries with no error anywhere.
"""

from __future__ import annotations

import sys
import types

import pytest

from chess_pos_db_spark import registry


def test_load_all_retry_rebuilds_full_registry(monkeypatch):
    saved_q = dict(registry.QUERIES)
    saved_o = dict(registry.ORACLES)
    saved_loaded = registry._LOADED
    fake_name = "chess_pos_db_spark._fake_registering"
    calls = {"n": 0}

    def fake_import():
        # module A imports + registers, then module B's import raises —
        # the exact mid-sequence failure load_all must be atomic under
        if fake_name not in sys.modules:
            sys.modules[fake_name] = types.ModuleType(fake_name)
            registry.register("_fake_q")(lambda s, d: None)
        if calls["n"] == 0:
            calls["n"] += 1
            raise RuntimeError("transient import failure")

    try:
        registry.QUERIES.clear()
        registry.ORACLES.clear()
        registry._LOADED = False
        monkeypatch.setattr(
            registry, "_import_registering_modules", fake_import
        )

        with pytest.raises(RuntimeError):
            registry.load_all()
        assert "_fake_q" not in registry.QUERIES  # registration rolled back
        assert fake_name not in sys.modules  # module cache purged too

        registry.load_all()  # retry succeeds...
        assert "_fake_q" in registry.QUERIES  # ...with the FULL registry
    finally:
        sys.modules.pop(fake_name, None)
        registry.QUERIES.clear()
        registry.QUERIES.update(saved_q)
        registry.ORACLES.clear()
        registry.ORACLES.update(saved_o)
        registry._LOADED = saved_loaded
