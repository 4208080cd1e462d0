"""Convert extractor dicts (reference-shaped, sparse) into the engine's
fixed-width Spark rows (SHAPES_SCHEMA).

Spark structs are fixed-width, so "key absent" (reference behavior,
ShaclPropertyAnalyzerTest.php:725-741) becomes NULL; the recursive path
union type is JSON-encoded in ``path_json`` (canonical: sort_keys,
compact separators) because Spark has no recursive struct type.
``row_to_shape_dict`` inverts the mapping so golden tests can compare
round-tripped records against pure-Python extractor output exactly.
"""

from __future__ import annotations

import json

_PS_STRING_KEYS = (
    "class datatype node nodeKind equals disjoint lessThan lessThanOrEquals "
    "qualifiedValueShape group minCount maxCount minLength maxLength pattern flags "
    "uniqueLang minInclusive maxInclusive minExclusive maxExclusive qualifiedMinCount "
    "qualifiedMaxCount qualifiedValueShapesDisjoint order deactivated hasValue "
    "defaultValue name description message"
).split()
_PS_ARRAY_KEYS = ["classes", "in", "languageIn", "messages"]
_PS_MAP_KEYS = ["labels", "descriptions"]
_INLINE_KEYS = "class datatype node nodeKind minCount maxCount minLength maxLength pattern".split()


def path_to_fields(path) -> dict:
    """path (str | nested dict) -> {path_type, path, paths, path_json}."""
    if isinstance(path, str):
        return {
            "path_type": "predicate",
            "path": path,
            "paths": None,
            "path_json": json.dumps(path, sort_keys=True, separators=(",", ":")),
        }
    ptype = path.get("type")
    out = {
        "path_type": ptype,
        "path": None,
        "paths": None,
        "path_json": json.dumps(path, sort_keys=True, separators=(",", ":")),
    }
    if "paths" in path:
        out["paths"] = [p if isinstance(p, str) else None for p in path["paths"]]
        if any(v is None for v in out["paths"]):
            out["paths"] = None  # nested members -> JSON only
    elif isinstance(path.get("path"), str):
        out["path"] = path["path"]
    return out


def fields_to_path(row: dict):
    """Inverse of path_to_fields via path_json."""
    return json.loads(row["path_json"]) if row.get("path_json") else None


def _inline_to_row(d: dict | None):
    if not d:
        return None
    return {k: d.get(k) for k in _INLINE_KEYS}


def _sparql_to_row(c: dict):
    return {
        "select": c.get("select"),
        "ask": c.get("ask"),
        "messages": c.get("messages"),
        "deactivated": bool(c.get("deactivated", False)),
        "prefixes": c.get("prefixes"),
    }


def property_shape_to_row(ps: dict) -> dict:
    row = path_to_fields(ps["path"])
    for k in _PS_STRING_KEYS:
        row[k] = ps.get(k)
    for k in _PS_ARRAY_KEYS:
        row[k] = ps.get(k)
    for k in _PS_MAP_KEYS:
        row[k] = ps.get(k)
    row["sh_or"] = [_inline_to_row(x) for x in ps["sh_or"]] if "sh_or" in ps else None
    row["sh_and"] = [_inline_to_row(x) for x in ps["sh_and"]] if "sh_and" in ps else None
    row["sh_xone"] = [_inline_to_row(x) for x in ps["sh_xone"]] if "sh_xone" in ps else None
    row["sh_not"] = _inline_to_row(ps.get("sh_not"))
    row["sparql_constraints"] = (
        [_sparql_to_row(c) for c in ps["sparql_constraints"]] if "sparql_constraints" in ps else None
    )
    return row


def shape_to_row(url: str, shape: dict) -> dict:
    c = shape.get("constraints") or {}
    return {
        "url": url,
        "uri": shape["uri"],
        "label": shape.get("label"),
        "labels": shape.get("labels") or None,
        "description": shape.get("description"),
        "descriptions": shape.get("descriptions") or None,
        "target_class": shape.get("target_class"),
        "target_classes": shape.get("target_classes") or [],
        "target_node": shape.get("target_node"),
        "target_nodes": shape.get("target_nodes") or [],
        "target_subjects_of": shape.get("target_subjects_of") or [],
        "target_objects_of": shape.get("target_objects_of") or [],
        "property_shapes": [property_shape_to_row(ps) for ps in shape.get("property_shapes", [])],
        "constraints": {
            "and": c.get("and"),
            "or": c.get("or"),
            "xone": c.get("xone"),
            "not": c.get("not"),
            "closed": c.get("closed"),
            "ignoredProperties": c.get("ignoredProperties"),
        },
        "sparql_constraints": [_sparql_to_row(x) for x in shape.get("sparql_constraints", [])],
        "severity": shape.get("severity", "violation"),
        "severity_iri": shape.get("severity_iri"),
        "message": shape.get("message"),
        "messages": shape.get("messages") or [],
        "deactivated": bool(shape.get("deactivated", False)),
        "source": (shape.get("metadata") or {}).get("source", "shacl_parser"),
        "types": (shape.get("metadata") or {}).get("types", []),
    }


def row_to_shape_dict(row: dict) -> dict:
    """Spark row (as dict) -> reference-shaped sparse dict for golden compare."""
    out = {
        "uri": row["uri"],
        "label": row["label"],
        "labels": row["labels"] or {},
        "description": row["description"],
        "descriptions": row["descriptions"] or {},
        "target_class": row["target_class"],
        "target_classes": list(row["target_classes"] or []),
        "target_node": row["target_node"],
        "target_nodes": list(row["target_nodes"] or []),
        "target_subjects_of": list(row["target_subjects_of"] or []),
        "target_objects_of": list(row["target_objects_of"] or []),
        "property_shapes": [_row_to_ps(ps) for ps in (row["property_shapes"] or [])],
        "constraints": {},
        "sparql_constraints": [_row_to_sparql(c) for c in (row["sparql_constraints"] or [])],
        "severity": row["severity"],
        "severity_iri": row["severity_iri"],
        "message": row["message"],
        "messages": list(row["messages"] or []),
        "deactivated": bool(row["deactivated"]),
        "metadata": {"source": row["source"], "types": list(row["types"] or [])},
    }
    c = row["constraints"] or {}
    for k in ("and", "or", "xone"):
        if c.get(k):
            out["constraints"][k] = list(c[k])
    if c.get("not") is not None:
        out["constraints"]["not"] = c["not"]
    if c.get("closed"):
        out["constraints"]["closed"] = True
        if c.get("ignoredProperties"):
            out["constraints"]["ignoredProperties"] = list(c["ignoredProperties"])
    return out


def _row_to_ps(ps: dict) -> dict:
    out: dict = {"path": fields_to_path(ps)}
    for k in _PS_STRING_KEYS:
        if ps.get(k) is not None:
            out[k] = ps[k]
    for k in _PS_ARRAY_KEYS:
        if ps.get(k) is not None:
            out[k] = list(ps[k])
    for k in _PS_MAP_KEYS:
        if ps.get(k) is not None:
            out[k] = dict(ps[k])
    for k in ("sh_or", "sh_and", "sh_xone"):
        if ps.get(k) is not None:
            out[k] = [_row_to_inline(x) for x in ps[k]]
    if ps.get("sh_not") is not None:
        inline = _row_to_inline(ps["sh_not"])
        if inline:
            out["sh_not"] = inline
    if ps.get("sparql_constraints") is not None:
        out["sparql_constraints"] = [_row_to_sparql(c) for c in ps["sparql_constraints"]]
    return out


def _row_to_inline(d: dict) -> dict:
    return {k: v for k, v in (d or {}).items() if v is not None}


def _row_to_sparql(c: dict) -> dict:
    out = {}
    if c.get("select") is not None:
        out["select"] = c["select"]
    if c.get("ask") is not None:
        out["ask"] = c["ask"]
    if c.get("messages"):
        out["messages"] = dict(c["messages"])
    out["deactivated"] = bool(c.get("deactivated", False))
    if c.get("prefixes"):
        out["prefixes"] = dict(c["prefixes"])
    return out
