"""Large-scale training-data pipeline operators.

Beyond the reference's surface (BASELINE.json north star): deduplication
(exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding cosine),
similarity search (brute-force + LSH ANN), text analysis (language id,
quality scoring, token counting, fingerprinting), and multimodal binary
column plumbing. All shuffle-conscious: blocking keys before pairwise
work, banding before joins, no driver-side collects.
"""
