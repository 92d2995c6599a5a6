"""Reusable Spark transformation operators.

Each module groups one family from SURVEY.md §2:

- ``relational``  — dedup-keep-latest, top-k per group, as-of join,
  interval-overlap join, merge-upsert (§2.C/D/E composites)
- ``timeseries``  — resample, gap-fill, sessionize (§2.K)
- ``quality``     — per-source data-quality audits (§2.K9)
- ``dedup``       — exact / MinHash-LSH / SimHash / n-gram-Jaccard /
  embedding near-dup (§2.L1-L2)
- ``similarity``  — cosine top-k, kNN classify, LSH-bucketed ANN (§2.L3-L4)
- ``text``        — tokenize, n-grams, tf-idf, text stats, language id,
  fingerprinting (§2.L5-L7)
- ``multimodal``  — binary-column plumbing for image/audio payloads (§2.L8)
"""
