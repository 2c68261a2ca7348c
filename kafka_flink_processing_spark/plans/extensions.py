"""Large-scale data-pipeline extensions (dedup/similarity/text) — filled in next milestones."""
