"""Analytics + LLM-pipeline operators — the engine's user-facing API.

These are generic DataFrame -> DataFrame transformations; the entries in
``watsondedupe_spark.queries`` are oracle-pinned specializations of the
same logic. Modules:

- ``dedupe``      — exact, MinHash-LSH, SimHash, n-gram Jaccard,
                    embedding near-dup
- ``similarity``  — brute-force cosine top-k; LSH-bucketed ANN
- ``text``        — language-id, quality scoring, token counting,
                    winnowing fingerprints
- ``multimodal``  — binary media columns: schema conventions + decode/
                    feature plumbing (decoders stubbed, see module doc)
"""
