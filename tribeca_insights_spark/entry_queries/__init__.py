"""Driver-contract queries and their DuckDB oracle SQL (per-domain package).

Split from the 19k-line monolithic ``entry_queries.py`` (r4 verdict #2) with
ZERO behavior change: the same ``QUERIES``/``ORACLE`` dicts, the same names.
``_shared`` owns the registry, the ``@q`` decorator and every cross-domain
helper/oracle fragment; each per-domain module registers its queries at
import time. Every registered query callable is also re-exported here by
name, so ``from tribeca_insights_spark.entry_queries import q355_domain_cap``
keeps working.

Each ``QUERIES[name]`` is ``(spark, sf_dir) -> DataFrame``; ``ORACLE[name]``
is ANSI SQL DuckDB runs over the same parquet tables (views: region nation
customer supplier part orders lineitem events documents embeddings). Column
names/aliases match exactly; all floating aggregates are rounded after
deterministic (decimal or order-identical) computation so the driver's
order-insensitive value-hash is stable across engines.
"""

from __future__ import annotations

from ._shared import *  # noqa: F401,F403
from ._shared import ORACLE, QUERIES, documents_as_pages, entry, q  # noqa: F401

from . import (  # noqa: E402,F401  — import order = registration order
    extraction,
    retrieval,
    relational,
    dedup,
    similarity,
    linkgraph,
    lm_tokenizer,
    sketches,
    sources,
    urlspace,
    mixing,
    textstats,
    evaluation,
    governance,
    streaming,
    multimodal,
    page_audit,
)

# every registered query callable is importable by name (tests do e.g.
# ``from tribeca_insights_spark.entry_queries import q355_domain_cap``)
globals().update({fn.__name__: fn for fn in QUERIES.values()})
