"""Distributed crawl state: sharded frontier actors, approximate seen-set
filters, politeness token buckets, robots cache, checkpoints.

This is the engine's only custom distributed state — everything else rides on
Dataset shuffles.  See BASELINE.json north_rule and SURVEY.md §3.1/§7.
"""
