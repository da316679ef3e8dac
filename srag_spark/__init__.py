"""srag_spark — a from-scratch PySpark-native re-expression of the
document-parsing / retrieval core of CyrilDesch/SRAG (reference at
/root/reference, studied for WHAT it computes, not HOW).

Architecture: declarative DataFrame plans optimized by Catalyst, with
vectorized pandas/Arrow UDFs only where built-in operators cannot express
the semantics (per-document parsing, chunking, embedding).  No services,
no row-at-a-time Python.
"""

__version__ = "0.1.0"
