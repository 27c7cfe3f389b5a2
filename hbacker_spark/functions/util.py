"""Small utility parity with the reference's helpers.

- U1 ``normalize_keys``: recursive hash-key normalization
  (Hbacker.transform_keys_to_symbols, lib/hbacker/helpers.rb:70-77) —
  Ruby symbolized keys become lowercase/underscore Python dict keys.
- U4 ``schema_to_descriptors``: reflection from a Spark StructType back
  to plain descriptor dicts (TableDescriptor#column_families_to_hashes,
  lib/hbacker/stargate.rb:23-33).
"""

from __future__ import annotations

import re

from pyspark.sql import types as T


def normalize_keys(obj):
    """Recursively lowercase/underscore dict keys ('Max Versions' /
    'maxVersions' / :MAX_VERSIONS → 'max_versions')."""
    if isinstance(obj, dict):
        out = {}
        for k, v in obj.items():
            key = str(k)
            key = re.sub(r"(?<=[a-z0-9])([A-Z])", r"_\1", key)  # camelCase → snake
            key = re.sub(r"[^0-9a-zA-Z]+", "_", key).strip("_").lower()
            out[key] = normalize_keys(v)
        return out
    if isinstance(obj, (list, tuple)):
        return [normalize_keys(v) for v in obj]
    return obj


def schema_to_descriptors(schema: T.StructType) -> list[dict]:
    """StructType → per-field descriptor dicts (name/type/nullable +
    metadata), the engine's answer to descriptor→hash reflection."""
    out = []
    for f in schema.fields:
        d = {"name": f.name, "type": f.dataType.simpleString(), "nullable": f.nullable}
        if f.metadata:
            d.update(normalize_keys(dict(f.metadata)))
        out.append(d)
    return out
