"""Driver contract for the graft builder (Ray Data target).

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) calls ``ray.init`` / ``ray.shutdown``.

``queries()`` exposes one entry per implemented operator/pipeline from
SURVEY.md §2; ``oracle_sql()`` provides the DuckDB-checkable subset.
Non-SQL-expressible operators (RDFC-1.0 canonicalization itself, minhash
sketches, …) are rows-only checked here and bit-exactly checked against
the W3C conformance suite + reference fixtures in ``tests/``.
"""

from __future__ import annotations

import os
import sys

from collections.abc import Callable
from typing import Any

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from rdf_canon_ray.runtime import ensure_importable

ensure_importable()

SF_SMOKE = "/root/testdata/sf0.001"


def entry() -> Any:
    """Flagship pipeline at sf0.001: transcripts → extraction → linking →
    per-graph RDFC-1.0 canonicalization. Returns the canonical-graphs
    Dataset (one row per conversation)."""
    from rdf_canon_ray.pipelines import kg

    return kg.canonical_graphs_dataset(SF_SMOKE)


def queries() -> dict[str, Callable[[str], Any]]:
    from rdf_canon_ray.pipelines import kg

    return {
        "kg_triples": lambda sf: kg.triples_dataset(sf),
        "kg_entity_mentions": lambda sf: kg.entity_mention_counts(sf),
        "kg_links": lambda sf: kg.distinct_links_dataset(sf),
        "kg_canonical_graphs": lambda sf: kg.canonical_graphs_dataset(sf),
    }


def oracle_sql() -> dict[str, str]:
    part_resolved = """
part_resolved AS (
  SELECT p_name, p_brand, MIN(p_partkey) AS pk FROM part GROUP BY 1, 2
)"""
    return {
        "kg_triples": f"""
WITH {part_resolved},
t AS (
  SELECT 'conv-' || o_orderkey AS conv_id, 'urn:e:order:' || o_orderkey AS subj,
         'urn:rel:placedBy' AS pred, 'urn:e:cust:' || o_custkey AS obj FROM orders
  UNION ALL
  SELECT 'conv-' || o_orderkey, 'urn:e:order:' || o_orderkey, 'urn:rel:status',
         o_orderstatus FROM orders
  UNION ALL
  SELECT 'conv-' || o_orderkey, 'urn:e:order:' || o_orderkey, 'urn:rel:priority',
         o_orderpriority FROM orders
  UNION ALL
  SELECT 'conv-' || l_orderkey, 'urn:e:order:' || l_orderkey, 'urn:rel:hasPart',
         'urn:e:part:' || pr.pk
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN part_resolved pr ON p.p_name = pr.p_name AND p.p_brand = pr.p_brand
  UNION ALL
  SELECT 'conv-' || l_orderkey, 'urn:e:order:' || l_orderkey, 'urn:rel:suppliedBy',
         'urn:e:supp:' || l_suppkey FROM lineitem
)
SELECT DISTINCT conv_id, subj, pred, obj FROM t
""",
        "kg_entity_mentions": f"""
WITH {part_resolved},
m AS (
  SELECT 'urn:e:cust:' || o_custkey AS entity_iri FROM orders
  UNION ALL
  SELECT 'urn:e:order:' || o_orderkey FROM orders
  UNION ALL
  SELECT 'urn:e:order:' || o_orderkey FROM orders
  UNION ALL
  SELECT 'urn:e:order:' || l_orderkey FROM lineitem
  UNION ALL
  SELECT 'urn:e:part:' || pr.pk
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN part_resolved pr ON p.p_name = pr.p_name AND p.p_brand = pr.p_brand
  UNION ALL
  SELECT 'urn:e:supp:' || l_suppkey FROM lineitem
)
SELECT entity_iri, COUNT(*) AS n_mentions FROM m GROUP BY entity_iri
""",
        "kg_links": f"""
WITH {part_resolved},
t AS (
  SELECT 'conv-' || o_orderkey AS conv_id, c_name AS surface,
         'urn:e:cust:' || c_custkey AS entity_iri
  FROM orders JOIN customer ON o_custkey = c_custkey
  UNION ALL
  SELECT 'conv-' || l_orderkey, p.p_name || '|' || p.p_brand,
         'urn:e:part:' || pr.pk
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN part_resolved pr ON p.p_name = pr.p_name AND p.p_brand = pr.p_brand
  UNION ALL
  SELECT 'conv-' || l_orderkey, s_name, 'urn:e:supp:' || l_suppkey
  FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
)
SELECT DISTINCT conv_id, surface, entity_iri FROM t
""",
    }
