"""Pure, deterministic scalar/vector functions used inside map_batches stages.

Every function here is side-effect free and process-deterministic so the same
code can serve both the distributed engine and the sequential conformance
oracle in tests.
"""
