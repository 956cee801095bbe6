"""vqa_tpu — a TPU-native (JAX/XLA/Pallas) visual-question-answering framework.

Re-implements, from scratch and TPU-first, the full capability set of the
PyTorch reference `Axe--/Visual-Question-Answering` (see SURVEY.md):

- VQA-v2 -> flat-text dataset preparation (``vqa_tpu.prepare_data``)
- question/answer vocabulary build + pickle contract (``vqa_tpu.vocab``)
- a "baseline" model (VGG-11-bn image encoder x GRU question encoder -> MLP
  classifier) and an "attention" model (Hierarchical Co-Attention), both as
  pure-functional flax modules jitted end to end (``vqa_tpu.models``)
- a fused Pallas kernel for the hot parallel co-attention block
  (``vqa_tpu.ops``)
- training/eval driver with TensorBoard + file logging and step checkpoints
  (``vqa_tpu.train``, ``vqa_tpu.main``)
- batch-parallel sharding over a TPU mesh (``vqa_tpu.parallel``)

The public data contract (dataset ``.txt`` lines ``img\\tq,tokens\\tans`` and
the vocab pickle ``{word2idx, idx2word, label2idx, idx2label, max_seq_length}``)
is identical to the reference so existing files work unchanged.
"""

__version__ = "0.1.0"
