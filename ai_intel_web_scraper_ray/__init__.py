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
