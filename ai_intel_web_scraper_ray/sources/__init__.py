"""Sources/sinks: synthetic corpus generators, validated readers,
partitioned resumable writers."""
