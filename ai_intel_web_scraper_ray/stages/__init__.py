"""Ray Data stages: vectorized map_batches transforms and actor-pool classes.

Each stage is ``Dataset -> Dataset`` and never materializes its input; wide
operations (dedup) document their shuffle keys.
"""
