"""Pure kernels (no Ray): parsers, tokenizer, splitter, classifier,
span assembler, consolidator, geometry, text statistics."""
