"""Relational + pipeline operators built Spark-first.

- ``defrag``     : the reference's UDP-fragment repair query layer (R2-R6,
                   /root/reference/src/main.rs:268-301) as DataFrame ops.
- ``convert``    : the end-to-end pcap → Parquet pipeline (K1-K3, D7).
- ``dedup``      : exact + near-duplicate detection (MinHash/LSH, SimHash,
                   n-gram Jaccard) for LLM-scale corpora.
- ``incremental``: the at-rest corpus index — cross-snapshot dedup without
                   re-shuffling old snapshots (write/probe/extend/compact).
- ``similarity`` : embedding similarity search (brute-force, LSH-bucketed,
                   IVF and IVF-PQ at rest, batch retrieval).
- ``multimodal`` : binary-payload column plumbing with typed metadata.
- ``graph``      : link-graph signals (WAT outlinks → PageRank).
- ``registry``   : extension-operator entries for the driver contract.
"""
