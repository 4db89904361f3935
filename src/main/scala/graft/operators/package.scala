package graft

/** The operator library — each object is one family from SURVEY §2,
  * re-expressed as `Column`/`DataFrame` builders over public Spark APIs:
  *
  *  - [[operators.Projection]] / [[operators.Cleaning]] — the reference's
  *    SELECT and WHERE clauses (P1–P11, C1–C7): row-local codegen'd
  *    expressions, no shuffles.
  *  - [[operators.Fingerprint]] — canonical row checksum (H1/H2),
  *    engine-portable md5-of-joined-fields.
  *  - [[operators.Delta]] / [[operators.Upsert]] / [[operators.Enrich]] —
  *    the incremental core (J1–J4, W2/W3): delta split, empty gate,
  *    union-merge, keep-first dedup, merge-with-precedence.
  *  - [[operators.Classify]] — rule + batched-LLM classification (K1–K4)
  *    with the deterministic stub and result cache.
  *  - [[operators.RangeJoin]] / [[operators.AsOf]] / [[operators.Skew]] —
  *    scale-safe join forms: bucketized band join, merge-form as-of join,
  *    salted skew join.
  *  - [[operators.Dedup]] / [[operators.Similarity]] /
  *    [[operators.TextStats]] / [[operators.Sampling]] /
  *    [[operators.Multimodal]] — the LLM-training-data surface: near-dup
  *    (Jaccard, MinHash+LSH, SimHash), vector search, text analysis,
  *    deterministic sampling, binary multimodal columns.
  *
  * Design rule throughout: built-in functions over UDFs, one shuffle per
  * semantic key change, and oracle-replayable (md5-derived) hashing
  * wherever a hash participates in verified output.
  */
package object operators
