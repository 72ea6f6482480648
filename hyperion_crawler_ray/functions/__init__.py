"""Pure, deterministic scalar/batch functions (no Ray dependency).

These are the frozen, versioned kernels the crawl invariants depend on:
URL canonicalization (RFC 3986) and HTML text extraction. Keeping them
Ray-free makes them reusable from both the distributed pipeline and the
single-threaded oracle, which is what lets us test crawl-order / seen-set
equality between the two.
"""
