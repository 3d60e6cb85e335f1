"""Deterministic entity dictionary — the linking KB held in actor state.

Schema mirrors the reference KB record (Cosmos scispacy/UMLS linker,
`ingest/process/entity_linking/link.py:60-67`): id, name, aliases, types,
description. Built from seeded word lists so the synthetic corpus can
plant mentions whose expected links are computable (FIXTURES.md F5).
"""

from __future__ import annotations

import random

import pyarrow as pa

# Word lists disjoint from the testdata text vocabulary and from the
# predicate lexicon, so surface matching is unambiguous.
_ADJ = [
    "Acme", "Apex", "Atlas", "Aurora", "Borealis", "Cascade", "Cobalt",
    "Crimson", "Delta", "Ember", "Falcon", "Granite", "Halcyon", "Icarus",
    "Juniper", "Keystone", "Lumen", "Meridian", "Nimbus", "Obsidian",
    "Pinnacle", "Quartz", "Raven", "Sable", "Summit", "Sterling", "Titan",
    "Umber", "Vertex", "Willow", "Zenith", "Onyx",
]
_NOUN = [
    "Corp", "Labs", "Systems", "Industries", "Group", "Holdings",
    "Dynamics", "Analytics", "Networks", "Partners", "Institute",
    "Foundry", "Works", "Ventures", "Collective", "Technologies",
]
_TYPES = ["ORG", "COMPANY", "LAB", "INSTITUTE"]
_PLACES = [
    "Eastport", "Westbrook", "Northfield", "Southgate", "Lakemont",
    "Riverton", "Hillcrest", "Stonebridge", "Fairhaven", "Oakdale",
]

DEFAULT_N_ENTITIES = 120
DEFAULT_SEED = 42


def build_entity_dict(n: int = DEFAULT_N_ENTITIES, seed: int = DEFAULT_SEED) -> pa.Table:
    """Return the KB as an Arrow table: (canonical_id, name, aliases,
    types, description). Deterministic for a given (n, seed)."""
    rng = random.Random(seed)
    used: set[str] = set()
    rows = []
    for i in range(n):
        while True:
            name = f"{rng.choice(_ADJ)} {rng.choice(_NOUN)}"
            if name not in used:
                used.add(name)
                break
        aliases = []
        # alias 1: initialism-ish short form  (e.g. "Acme Corp" -> "AcmeC")
        if rng.random() < 0.8:
            parts = name.split()
            aliases.append(parts[0] + parts[1][0])
        # alias 2: "The <name>"
        if rng.random() < 0.4:
            aliases.append("The " + name)
        etype = rng.choice(_TYPES)
        place = rng.choice(_PLACES)
        rows.append(
            {
                "canonical_id": f"E{i:04d}",
                "name": name,
                "aliases": aliases,
                "types": [etype],
                "description": f"{name} is a {etype.lower()} based in {place}.",
            }
        )
    return pa.Table.from_pylist(
        rows,
        schema=pa.schema(
            [
                ("canonical_id", pa.string()),
                ("name", pa.string()),
                ("aliases", pa.list_(pa.string())),
                ("types", pa.list_(pa.string())),
                ("description", pa.string()),
            ]
        ),
    )


def surface_index(kb: pa.Table) -> dict[str, tuple[str, float]]:
    """surface form -> (canonical_id, score). Exact name match scores 1.0,
    alias match 0.9 (reference threshold semantics: candidate score > 0.8
    links, `link.py:11`)."""
    idx: dict[str, tuple[str, float]] = {}
    for row in kb.to_pylist():
        idx[row["name"]] = (row["canonical_id"], 1.0)
        for a in row["aliases"]:
            idx.setdefault(a, (row["canonical_id"], 0.9))
    return idx


# Surfaces that are NOT in the KB — planted to exercise the unlinked path
# (`ents_unlinked`, `link.py:24-35`).
UNKNOWN_SURFACES = [
    "Vortex Syndicate", "Quasar Guild", "Nebula Cartel", "Pulsar Union",
    "Comet Assembly", "Meteor Circle", "Eclipse Society", "Galaxy Forum",
]
