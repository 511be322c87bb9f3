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


def _w3c_conformance(sf_dir: str) -> Any:
    """Distributed W3C rdfc10 conformance run (fixture-driven; sf_dir
    unused). 86/86 must pass."""
    from rdf_canon_ray.pipelines.conformance import run_conformance

    return run_conformance(sf_dir)


def _skewed_graphs(sf_dir: str) -> Any:
    """Zipf-skewed + unicode-torture transcript corpus (synthetic,
    deterministic; sf_dir unused): canonicalization under conv_id skew."""
    from rdf_canon_ray.transcripts.gen_skewed import skewed_canonical_graphs

    return skewed_canonical_graphs(sf_dir)


def queries() -> dict[str, Callable[[str], Any]]:
    from rdf_canon_ray.pipelines import analytics, corpus, kg

    return {
        # knowledge-graph construction family (SURVEY.md §2.1-2.2)
        "kg_triples": lambda sf: kg.triples_dataset(sf),
        "kg_entity_mentions": lambda sf: kg.entity_mention_counts(sf),
        "kg_links": lambda sf: kg.distinct_links_dataset(sf),
        "kg_canonical_graphs": lambda sf: kg.canonical_graphs_dataset(sf),
        "kg_canonical_sha384": lambda sf: kg.canonical_graphs_dataset(
            sf, hash_name="sha384"
        ),
        "kg_canonical_partitioned": lambda sf: kg.canonical_graphs_partitioned(sf),
        "rdfc_labels": lambda sf: kg.canonical_labels_dataset(sf),
        "w3c_conformance": _w3c_conformance,
        "kg_skewed_graphs": _skewed_graphs,
        "kg_entity_degree": lambda sf: kg.entity_degree(sf),
        "rdfc_hard_graphs": lambda sf: kg.hard_graphs(sf),
        # relational / wide-op family (§2.4 aggregations, joins, sorts)
        "pricing_summary": analytics.pricing_summary,
        "top_customers": analytics.top_customers,
        "events_hourly": analytics.events_hourly,
        "docs_by_source": analytics.docs_by_source,
        "orders_by_nation": analytics.orders_by_nation,
        "events_prev": analytics.events_prev,
        "orders_automobile": analytics.orders_automobile,
        # dedup family
        "dedup_exact": corpus.dedup_exact,
        "dedup_minhash_pairs": corpus.minhash_pairs,
        "dedup_minhash_groups": corpus.minhash_groups,
        "dedup_simhash_pairs": corpus.simhash_pairs,
        "dedup_ngram_jaccard": corpus.ngram_jaccard_pairs,
        "dedup_embedding_pairs": corpus.embedding_near_dups,
        # text analysis family
        "token_stats": corpus.token_stats,
        "quality_scores": corpus.quality_scores,
        "lang_id": corpus.lang_id,
        "fingerprints": corpus.fingerprints,
        # similarity search family
        "ann_topk": corpus.ann_topk,
        "ann_lsh_topk": corpus.ann_lsh_topk,
        "ann_ivf_topk": corpus.ann_ivf_topk,
        # multimodal plumbing family
        "media_features": corpus.media_feature_table,
        "media_resized": corpus.media_resized,
        "media_frames": corpus.media_frames,
        "media_stats": corpus.media_stats,
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
        "kg_entity_degree": f"""
WITH {part_resolved},
m AS (
  SELECT 'conv-' || o_orderkey AS conv_id, 'urn:e:cust:' || o_custkey AS entity_iri
  FROM orders
  UNION ALL
  SELECT 'conv-' || o_orderkey, 'urn:e:order:' || o_orderkey FROM orders
  UNION ALL
  SELECT 'conv-' || l_orderkey, 'urn:e:order:' || l_orderkey FROM lineitem
  UNION ALL
  SELECT 'conv-' || l_orderkey, 'urn:e:part:' || pr.pk
  FROM lineitem l
  JOIN part p ON l.l_partkey = p.p_partkey
  JOIN part_resolved pr ON p.p_name = pr.p_name AND p.p_brand = pr.p_brand
  UNION ALL
  SELECT 'conv-' || l_orderkey, 'urn:e:supp:' || l_suppkey FROM lineitem
)
SELECT entity_iri, COUNT(DISTINCT conv_id) AS n_convs FROM m GROUP BY entity_iri
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
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 4) AS sum_qty,
       ROUND(SUM(l_extendedprice), 4) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
       COUNT(*) AS count_order,
       ROUND(SUM(l_quantity) / COUNT(*), 6) AS avg_qty
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
""",
        "top_customers": """
SELECT c_custkey, ROUND(revenue, 4) AS revenue, c_name
FROM (
  SELECT o_custkey AS c_custkey, SUM(o_totalprice) AS revenue
  FROM orders GROUP BY o_custkey
) r JOIN customer USING (c_custkey)
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
""",
        "events_hourly": """
SELECT user_id, event_type, date_trunc('hour', ts) AS window_start,
       COUNT(*) AS n_events, ROUND(SUM(value), 6) AS sum_value
FROM events
GROUP BY user_id, event_type, date_trunc('hour', ts)
""",
        "docs_by_source": """
SELECT source, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY source
""",
        "orders_by_nation": """
SELECT n_name, COUNT(*) AS n_orders, ROUND(SUM(o_totalprice), 4) AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
        "events_prev": """
SELECT event_id, user_id,
       COALESCE(
         LAG(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id),
         -1
       ) AS prev_event_id
FROM events
""",
        "orders_automobile": """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 4) AS o_totalprice
FROM orders
WHERE o_custkey IN (
  SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE'
)
""",
        "dedup_exact": """
SELECT md5(text) AS content_hash, MIN(doc_id) AS doc_id, COUNT(*) AS n_dups
FROM documents GROUP BY text
""",
        "token_stats": """
SELECT doc_id,
       LENGTH(text) AS n_chars_obs,
       LENGTH(regexp_extract_all(text, '\\S+')) AS n_ws_tokens,
       LENGTH(regexp_extract_all(text, '[A-Za-z0-9]+(''[a-z]+)?'))
         AS n_word_tokens
FROM documents
""",
        "ann_topk": """
WITH q AS (
  SELECT vec_id, embedding FROM embeddings ORDER BY vec_id LIMIT 8
), qq AS (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS query_id,
         CAST(embedding AS DOUBLE[]) AS qv
  FROM q
), scored AS (
  SELECT qq.query_id, e.vec_id,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), qq.qv) AS s
  FROM embeddings e CROSS JOIN qq
), ranked AS (
  SELECT query_id, vec_id, s,
         ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, vec_id ASC)
           AS rank
  FROM scored
)
SELECT query_id, rank, vec_id, ROUND(s, 6) AS score
FROM ranked WHERE rank <= 10
""",
    }
