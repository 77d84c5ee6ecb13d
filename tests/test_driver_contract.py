"""Driver-contract invariants: the shape the grading driver depends on.
Breaks loudly in pytest instead of silently at the driver gate."""

from __future__ import annotations

import __spark_entry__ as entrymod


def test_driver_surface_is_exactly_50():
    qs = entrymod.queries()
    assert len(qs) == 50
    assert list(qs) == entrymod.DRIVER_KEYS


def test_every_driver_query_has_an_oracle():
    assert set(entrymod.oracle_sql()) == set(entrymod.queries())


def test_extras_and_driver_keys_disjoint():
    qs, extras = entrymod.queries(), entrymod.extra_queries()
    assert not (set(qs) & set(extras))
    # every extra oracle belongs to an extra query
    assert set(entrymod.extra_oracle_sql()) <= set(extras)


def test_all_callables_are_two_arg():
    import inspect

    for name, fn in {**entrymod.queries(), **entrymod.extra_queries()}.items():
        n_required = sum(
            1
            for p in inspect.signature(fn).parameters.values()
            if p.default is inspect.Parameter.empty
            and p.kind
            in (p.POSITIONAL_ONLY, p.POSITIONAL_OR_KEYWORD)
        )
        assert n_required == 2, f"{name} must take (spark, sf_dir)"
