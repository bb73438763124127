"""End-to-end pipelines: generate (flagship), density pyramid, cost."""
