"""End-to-end pipelines composing the stages (process / vectorize / crawl /
search), mirroring the reference CLI entry points (pipeline.py scrape /
process / vectorize) Ray-Data-first."""
