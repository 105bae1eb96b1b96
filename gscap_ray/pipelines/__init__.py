"""Dataset pipelines composing stages into end-to-end jobs."""
