"""Ray-Data-native main-content extraction engine.

A from-scratch re-expression of the data-processing capabilities of
aws-samples/amazon-textract-transformer-pipeline (the "reference") as a
Ray Data pipeline over Parquet tables of multi-turn conversation/agent
transcripts:

    read_parquet(transcripts)
      -> map_batches(parse_turns)           # payload -> block tree -> words/boxes
      -> map_batches(WordClassifier, ...)   # actor pool: tokenize/split/classify
      -> map_batches(assemble_turns)        # span assembly + field consolidation
      -> groupby(conv_id) ordered outputs   # stable turn ordering
      -> write_parquet + per-partition checkpoint manifests

The reference tells us WHAT to compute (Textract-style PAGE/LINE/WORD block
trees, per-WORD class enrichment, entity-span extraction, per-field
consolidation); execution is idiomatic Ray Data, not a port.

Never calls ``ray.init()``/``ray.shutdown()`` at import or inside library
functions — session ownership belongs to the caller (bench.py / tests / CLI).
"""

__version__ = "0.1.0"
