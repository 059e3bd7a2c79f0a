"""Ray-Data-native competitive-intelligence data engine.

A from-scratch reimplementation of the query / data-processing capabilities of
the reference repo ``xbsd/ai_intel_web_scraper`` (see /root/reference), built
Ray-Data-first:

- every per-record transform is a vectorized ``map_batches`` over Arrow or
  pandas batches,
- stateful stages (tokenizer, keyword banks, embedders) are actor pools,
- wide operations (dedup, grouping, sorts) are explicit shuffles with
  documented keys,
- the crawl tier is a sharded URL frontier (seen-set, politeness, robots,
  priority queue) of named Ray actors feeding fetch/extract Dataset rounds.

Nothing in this package calls ``ray.init`` / ``ray.shutdown`` — sessions are
owned by the caller (driver, bench.py, or the pytest fixture).
"""

__version__ = "0.1.0"

import os as _os

# Cap polars' lazily-created rayon + tokio pools BEFORE anything imports
# polars (Ray Data's sort path does, inside every worker).  Uncapped,
# each Ray worker process that touches a sort spawns 32 rayon + 32 tokio
# threads sized to the MACHINE's CPU count — ~130 threads/worker — and a
# long gate run (260+ dataset executions) walks the node into
# pthread_create failure.  This module is imported in every worker when
# our map functions deserialize, which happens before the first polars
# import in that worker.  setdefault → callers can still override.
_os.environ.setdefault("POLARS_MAX_THREADS", "4")
