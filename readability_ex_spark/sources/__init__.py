"""Sources: web-page table readers and deterministic page synthesis."""
