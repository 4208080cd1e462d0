"""Pure-Python RDF layer used *inside* Arrow UDFs.

No external RDF library exists in the runtime, so the engine vendors a
deterministic, dependency-free parser stack:

- ``terms``   : RDF term model (tuples, Arrow-friendly)
- ``turtle``  : Turtle 1.1 parser (tokenizer + recursive descent)
- ``ntriples``: N-Triples parser
- ``jsonld``  : minimal JSON-LD 1.0 expansion to triples
- ``rdfa``    : minimal RDFa-lite extraction from HTML
- ``xmlrdf``  : minimal RDF/XML parser (stdlib ElementTree)
- ``detect``  : content-sniffing format detection (reference parity:
  /root/reference/tests/Characterization/ShaclParserTest.php:197-290)
- ``graph``   : tiny indexed triple bag with Resource-style get/all
"""
