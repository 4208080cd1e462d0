"""Tiny in-memory indexed triple bag — the per-document working set.

Mirrors the Resource::get/all access pattern of the reference
(/root/reference/src/Extractors/ShaclShapeProcessor.php:151,198): per-subject
per-predicate value lists in *document encounter order* (load-bearing for the
first-wins language maps, ShaclShapeProcessor.php:299-313).

This object only ever holds ONE document's triples inside an Arrow UDF batch —
it is not a corpus store. Corpus-level state lives in DataFrames.
"""

from __future__ import annotations

from .terms import RDF_TYPE


class Graph:
    __slots__ = ("spo", "subjects")

    def __init__(self, triples=()):
        # subject value -> predicate IRI -> list of object terms
        self.spo: dict[str, dict[str, list[tuple]]] = {}
        # subject value -> subject term (to know bnode vs iri)
        self.subjects: dict[str, tuple] = {}
        for s, p, o in triples:
            self.add(s, p, o)

    def add(self, s: tuple, p: tuple, o: tuple) -> None:
        skey = s[0]
        if skey not in self.spo:
            self.spo[skey] = {}
            self.subjects[skey] = s
        self.spo[skey].setdefault(p[0], []).append(o)

    def resources(self):
        """All subjects in encounter order (reference: Graph::resources())."""
        return list(self.subjects.values())

    def all(self, subject: str, predicate: str) -> list[tuple]:
        props = self.spo.get(subject)
        if not props:
            return []
        return props.get(predicate, [])

    def get(self, subject: str, predicate: str):
        vals = self.all(subject, predicate)
        return vals[0] if vals else None

    def is_a(self, subject: str, type_iri: str) -> bool:
        return any(
            o[1] != "literal" and o[0] == type_iri for o in self.all(subject, RDF_TYPE)
        )

    def predicates(self, subject: str) -> list[str]:
        return list(self.spo.get(subject, {}).keys())

    def __len__(self) -> int:
        return sum(len(v) for props in self.spo.values() for v in props.values())
