"""JSON-Schema draft-4 export — feature parity with the reference's
``src/Data/Schematic/JsonSchema.hs:26-124``.

Arithmetic is byte-identical:
  * ``TEq n``  → ``minLength = maxLength = n``            (JsonSchema.hs:30-32)
  * ``TLt n``  → ``maxLength = n-1`` (clamped at 0)       (:35-37)
  * ``TLe n``  → ``maxLength = n``                        (:33-34)
  * ``TGt n``  → ``minLength = n+1``                      (:38-39)
  * ``TGe n``  → ``minLength = n``                        (:40-41)
  * ``TRegex`` → ``pattern``; ``TEnum`` → ``enum``        (:42-45)
  * numbers    → ``minimum/maximum`` + ``exclusiveMin/Max``(:47-60)
  * arrays     → ``minItems/maxItems`` same ±1 arithmetic (:62-74)
  * object     → ``required`` = non-optional field names  (:97-108)
  * optional   → ``oneOf [null, s]``; union → ``anyOf``   (:116-124)
"""

from __future__ import annotations

from .ast import (
    AEq,
    AGe,
    AGt,
    ALe,
    ALt,
    NEq,
    NGe,
    NGt,
    NLe,
    NLt,
    SArray,
    SBoolean,
    Schema,
    SNull,
    SNumber,
    SObject,
    SOptional,
    SText,
    SUnion,
    TEnum,
    TEq,
    TGe,
    TGt,
    TLe,
    TLt,
    TRegex,
)

DRAFT4 = "http://json-schema.org/draft-04/schema#"


def to_json_schema(schema: Schema) -> dict:
    """Export with the ``$schema`` marker (toJsonSchema, JsonSchema.hs:77-84)."""
    out = to_json_schema_inner(schema)
    out["$schema"] = DRAFT4
    return out


def to_json_schema_inner(schema: Schema) -> dict:
    """Export without the marker (toJsonSchema', JsonSchema.hs:86-124)."""
    if isinstance(schema, SText):
        out: dict = {"type": "string"}
        for c in schema.constraints:
            if isinstance(c, TEq):
                out["minLength"] = c.n
                out["maxLength"] = c.n
            elif isinstance(c, TLe):
                out["maxLength"] = c.n
            elif isinstance(c, TLt):
                out["maxLength"] = 0 if c.n == 0 else c.n - 1
            elif isinstance(c, TGt):
                out["minLength"] = c.n + 1
            elif isinstance(c, TGe):
                out["minLength"] = c.n
            elif isinstance(c, TRegex):
                out["pattern"] = c.pattern
            elif isinstance(c, TEnum):
                out["enum"] = list(c.values)
        return out
    if isinstance(schema, SNumber):
        out = {"type": "number"}
        for c in schema.constraints:
            if isinstance(c, NLe):
                out["maximum"] = c.n
            elif isinstance(c, NLt):
                out["maximum"] = c.n
                out["exclusiveMaximum"] = True
            elif isinstance(c, NGt):
                out["minimum"] = c.n
                out["exclusiveMinimum"] = True
            elif isinstance(c, NGe):
                out["minimum"] = c.n
            elif isinstance(c, NEq):
                out["minimum"] = c.n
                out["maximum"] = c.n
        return out
    if isinstance(schema, SBoolean):
        return {"type": "boolean"}
    if isinstance(schema, SNull):
        return {"type": "null"}
    if isinstance(schema, SObject):
        required = [
            n for n, s in schema.fields if not isinstance(s, SOptional)
        ]
        return {
            "type": "object",
            "required": required,
            "properties": {
                n: to_json_schema_inner(s) for n, s in schema.fields
            },
        }
    if isinstance(schema, SArray):
        out = {
            "type": "array",
            "items": to_json_schema_inner(schema.item),
        }
        for c in schema.constraints:
            if isinstance(c, ALe):
                out["maxItems"] = c.n
            elif isinstance(c, ALt):
                out["maxItems"] = 0 if c.n == 0 else c.n - 1
            elif isinstance(c, AGt):
                out["minItems"] = c.n + 1
            elif isinstance(c, AGe):
                out["minItems"] = c.n
            elif isinstance(c, AEq):
                out["minItems"] = c.n
                out["maxItems"] = c.n
        return out
    if isinstance(schema, SOptional):
        return {
            "oneOf": [
                to_json_schema_inner(SNull()),
                to_json_schema_inner(schema.inner),
            ]
        }
    if isinstance(schema, SUnion):
        if not schema.alternatives:
            raise ValueError("empty union has no JSON-Schema rendering")
        return {
            "anyOf": [to_json_schema_inner(a) for a in schema.alternatives]
        }
    raise TypeError(f"unknown schema node {schema!r}")


# ---------------------------------------------------------------------------
# Draft-4 import — the inverse direction (SURVEY §3 "also the reverse").
# The reference does this in the type system; here it is a plain parser.
# ---------------------------------------------------------------------------

def from_json_schema(doc: dict) -> Schema:
    """Parse a draft-4 document back into the schema AST.

    Exact inverse of :func:`to_json_schema` up to constraint
    normalization (the export already normalizes ``TLt n`` →
    ``maxLength n-1`` etc., so importing yields the inclusive forms
    ``TLe``/``TGe``; ``minLength == maxLength`` imports as ``TEq``,
    ``minimum == maximum`` as ``NEq``, ``minItems == maxItems`` as
    ``AEq``). ``export(parse(export(s))) == export(s)`` for every
    schema — the round-trip property test pins it.
    """
    if "oneOf" in doc:
        alts = doc["oneOf"]
        if (
            len(alts) == 2
            and alts[0].get("type") == "null"
        ):
            return SOptional(from_json_schema(alts[1]))
        return SUnion(tuple(from_json_schema(a) for a in alts))
    if "anyOf" in doc:
        return SUnion(tuple(from_json_schema(a) for a in doc["anyOf"]))
    t = doc.get("type")
    if t == "string":
        cs: list = []
        lo, hi = doc.get("minLength"), doc.get("maxLength")
        if lo is not None and lo == hi:
            cs.append(TEq(lo))
        else:
            if lo is not None:
                cs.append(TGe(lo))
            if hi is not None:
                cs.append(TLe(hi))
        if "pattern" in doc:
            cs.append(TRegex(doc["pattern"]))
        if "enum" in doc:
            cs.append(TEnum(tuple(doc["enum"])))
        return SText(tuple(cs))
    if t in ("number", "integer"):
        cs = []
        lo, hi = doc.get("minimum"), doc.get("maximum")
        xlo = bool(doc.get("exclusiveMinimum"))
        xhi = bool(doc.get("exclusiveMaximum"))
        if lo is not None and lo == hi and not xlo and not xhi:
            cs.append(NEq(lo))
        else:
            if lo is not None:
                cs.append(NGt(lo) if xlo else NGe(lo))
            if hi is not None:
                cs.append(NLt(hi) if xhi else NLe(hi))
        return SNumber(tuple(cs))
    if t == "boolean":
        return SBoolean()
    if t == "null":
        return SNull()
    if t == "object":
        required = set(doc.get("required", ()))
        fields = []
        for name, sub in doc.get("properties", {}).items():
            parsed = from_json_schema(sub)
            if name not in required and not isinstance(parsed, SOptional):
                parsed = SOptional(parsed)
            fields.append((name, parsed))
        return SObject(tuple(fields))
    if t == "array":
        cs = []
        lo, hi = doc.get("minItems"), doc.get("maxItems")
        if lo is not None and lo == hi:
            cs.append(AEq(lo))
        else:
            if lo is not None:
                cs.append(AGe(lo))
            if hi is not None:
                cs.append(ALe(hi))
        item = doc.get("items")
        return SArray(
            from_json_schema(item) if item is not None else SText(),
            tuple(cs),
        )
    raise ValueError(f"cannot import JSON-Schema node: {doc!r}")
