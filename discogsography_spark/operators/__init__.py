"""Training-data-pipeline operators over document / embedding tables:
deduplication (exact, MinHash-LSH, SimHash, n-gram Jaccard), similarity
search (brute-force + LSH-bucketed ANN), and text analysis (language-ID,
quality scoring, token counting, fingerprinting).

These generalize the reference's content-identity machinery (SHA-256 hash
dedup, /root/reference/extractor/src/types.rs:163-168 and
/root/reference/tableinator/batch_processor.py:453-479) and its sparse-vector
cosine similarity (/root/reference/api/queries/similarity.py:15-25) to
corpus-scale Spark primitives.
"""
