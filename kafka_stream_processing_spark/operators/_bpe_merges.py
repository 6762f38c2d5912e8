"""Trained BPE merge table — GENERATED, do not hand-edit.

Produced by ``python -m kafka_stream_processing_spark.tools.
train_bpe_merges`` over ``/root/testdata/sf0.001`` (deterministic: Spark word
frequencies, lexicographic tie-break, staged-rewrite-consistent
pair application).  The reproduction test
(tests/test_round5b_ops.py::test_trained_bpe_merges_reproduce)
re-trains and asserts equality, so these literals can never
drift from the trainer that claims to produce them."""

TRAIN_SF = '/root/testdata/sf0.001'

BPE_MERGES: tuple[tuple[str, str], ...] = (('e', 'r'), ('o', 'r'), ('i', 'n'), ('o', 'w'), ('s', 't'), ('l', 'u'), ('a', 'r'), ('p', 'ar'), ('m', 'er'), ('a', 't'), ('a', 'n'), ('c', 'an'), ('s', 'can'), ('c', 'o'), ('co', 'lu'), ('colu', 'm'), ('colum', 'n'), ('d', 'ow'))
