"""Cross-cutting function libraries: deterministic text/vector hashing
(Catalyst + Arrow-kernel twins), scalable sequence assignment, filters and
search, multimodal binary-column plumbing, and the LLM-pipeline query
surface."""
