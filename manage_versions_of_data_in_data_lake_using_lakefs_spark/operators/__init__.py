"""Operator layer: relational parity ops + pipeline extensions.

Submodules map to SURVEY.md §2 groups:

- ``transforms``  — §2.2 projections/filters/casts/conditionals
- ``joins``       — §2.3 join surface
- ``aggregates``  — §2.4 aggregations
- ``windows``     — §2.5 window functions (incl. scale-safe global IDs)
- ``features``    — vdt4-parity ML feature pipeline ops
- ``dedup``       — exact + MinHash-LSH + SimHash + n-gram Jaccard +
                    embedding-cosine near-dup (north-star extensions)
- ``similarity``  — ANN / top-k cosine search over embedding columns
- ``text``        — language-ID, quality scoring, token counting,
                    fingerprinting
- ``multimodal``  — binary-column (image/audio/video) plumbing
- ``mutations``   — MERGE INTO-style row-level upsert
"""
