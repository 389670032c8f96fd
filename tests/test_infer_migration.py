"""Schema-drift inference: infer_migration round-trips apply_migration."""

from __future__ import annotations

import random

from schematic_spark.migrations import (
    TRAVERSE,
    AddKey,
    DeleteKey,
    Diff,
    Migration,
    Update,
    apply_migration,
    infer_diffs,
    infer_migration,
)
from schematic_spark.schema import (
    NGe,
    SArray,
    SNumber,
    SObject,
    SOptional,
    SText,
    TEnum,
    TGe,
)


def _normalize(s):
    """Recursively sort object fields — AddKey prepends, so round-trip
    order fidelity is only up to permutation."""
    if isinstance(s, SObject):
        return SObject(tuple(sorted(
            ((n, _normalize(f)) for n, f in s.fields), key=lambda t: t[0]
        )))
    if isinstance(s, SArray):
        return SArray(_normalize(s.item), s.constraints)
    if isinstance(s, SOptional):
        return SOptional(_normalize(s.inner))
    return s


def _roundtrip(old, new):
    got = apply_migration(infer_migration(old, new), old)
    assert _normalize(got) == _normalize(new), (old, new, got)


def test_identical_schemas_no_diffs():
    s = SObject((("a", SText()), ("b", SNumber((NGe(0),)))))
    assert infer_diffs(s, s) == ()


def test_add_delete_update_top_level():
    old = SObject((("a", SText()), ("b", SNumber()), ("c", SText())))
    new = SObject((("a", SText((TGe(1),))), ("c", SText()),
                   ("d", SNumber())))
    diffs = infer_diffs(old, new)
    assert Diff((), DeleteKey("b")) in diffs
    assert Diff(("a",), Update(SText((TGe(1),)))) in diffs
    assert Diff((), AddKey("d", SNumber())) in diffs
    _roundtrip(old, new)


def test_nested_object_path():
    old = SObject((("meta", SObject((("x", SNumber()),))),))
    new = SObject((("meta", SObject((("x", SNumber((NGe(0),))),
                                     ("y", SText()),))),))
    diffs = infer_diffs(old, new)
    assert Diff(("meta", "x"), Update(SNumber((NGe(0),)))) in diffs
    assert Diff(("meta",), AddKey("y", SText())) in diffs
    _roundtrip(old, new)


def test_array_item_field_via_traverse():
    old = SObject((("spans", SArray(SObject((("kind", SText()),)))),))
    new = SObject((("spans", SArray(SObject((
        ("kind", SText((TEnum(("text", "media")),))),)))),))
    diffs = infer_diffs(old, new)
    assert diffs == (Diff(
        ("spans", TRAVERSE, "kind"),
        Update(SText((TEnum(("text", "media")),))),
    ),)
    _roundtrip(old, new)


def test_array_constraint_change_is_whole_update():
    from schematic_spark.schema import AGe

    old = SObject((("xs", SArray(SNumber())),))
    new = SObject((("xs", SArray(SNumber(), (AGe(1),))),))
    diffs = infer_diffs(old, new)
    assert diffs == (Diff(("xs",), Update(SArray(SNumber(), (AGe(1),)))),)
    _roundtrip(old, new)


def test_optional_inner_scalar_change_escalates_to_update():
    old = SObject((("o", SOptional(SText())),))
    new = SObject((("o", SOptional(SNumber())),))
    diffs = infer_diffs(old, new)
    assert diffs == (Diff(("o",), Update(SOptional(SNumber()))),)
    _roundtrip(old, new)


def test_optional_object_field_add_escalates():
    """AddKey cannot target an SOptional node at path end — the inferred
    edit must be a whole-node Update, and still round-trip."""
    old = SObject((("o", SOptional(SObject((("x", SText()),)))),))
    new = SObject((("o", SOptional(SObject((("x", SText()),
                                            ("y", SNumber()),)))),))
    diffs = infer_diffs(old, new)
    assert diffs == (Diff(("o",), Update(new.fields[0][1])),)
    _roundtrip(old, new)


def test_optional_nested_deep_update_passes_through():
    """A deeper edit inside an optional object targets the inner path —
    no escalation needed (apply_action_at unwraps optionals mid-path)."""
    old = SObject((("o", SOptional(SObject((("x", SText()),)))),))
    new = SObject((("o", SOptional(SObject((
        ("x", SText((TGe(2),))),)))),))
    diffs = infer_diffs(old, new)
    assert diffs == (Diff(("o", "x"), Update(SText((TGe(2),)))),)
    _roundtrip(old, new)


def test_kind_change_is_update():
    old = SObject((("v", SText()),))
    new = SObject((("v", SArray(SNumber())),))
    _roundtrip(old, new)


def test_random_schema_pairs_roundtrip():
    """Property: for random schema pairs, applying the inferred
    migration to old yields new (up to field order)."""
    from test_differential_property import _rand_schema

    for seed in range(40):
        rng = random.Random(1000 + seed)
        old = _rand_schema(rng, depth=2)
        new = _rand_schema(rng, depth=2)
        if not isinstance(old, SObject):
            old = SObject((("root", old),))
        if not isinstance(new, SObject):
            new = SObject((("root", new),))
        _roundtrip(old, new)


def test_random_mutation_chain_roundtrip():
    """Mutate a schema through the apply machinery, then infer the
    migration from original to mutated and round-trip it."""
    base = SObject((
        ("a", SText()),
        ("b", SNumber((NGe(0),))),
        ("spans", SArray(SObject((("kind", SText()), ("off", SNumber()))))),
    ))
    mutated = apply_migration(Migration("m", (
        Diff((), DeleteKey("a")),
        Diff(("spans", TRAVERSE), AddKey("ref", SOptional(SText()))),
        Diff(("b",), Update(SNumber())),
        Diff((), AddKey("z", SText((TGe(1),)))),
    )), base)
    _roundtrip(base, mutated)
