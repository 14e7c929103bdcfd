"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference `karthikeyan19/agentic_workflow_for_data_transformation`
(an agentic NL->pandas transformation workflow), rebuilt Spark-first.

Architecture (SURVEY.md section 7):

- a deterministic relational core: a typed transform-spec IR
  (``plans.spec``) compiled to DataFrame lineage (``plans.compile``) so
  Catalyst handles pushdown/pruning/codegen;
- a rule-based NL parser (``plans.parser``) that maps the reference's
  natural-language transformation descriptions to specs (the reference
  does this with an LLM emitting free-form pandas that it ``exec``s --
  see reference agentic_workflow_transformation.py:57-129);
- an agentic orchestration layer (``agents.orchestrator``) --
  planner / executor / critic with retry, LLM optional -- living
  entirely on the driver, never inside a Spark task;
- scale-path operators for LLM data pipelines (``operators``):
  dedup (exact / MinHash-LSH / SimHash / n-gram Jaccard), similarity
  search over embeddings, text analysis, multimodal binary plumbing;
- Structured Streaming over the events table (``streaming``).
"""

__version__ = "0.1.0"
