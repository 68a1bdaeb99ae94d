"""tell_tpu: TPU-native news-image captioning framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
alasdairtran/transform-and-tell (CVPR 2020). The compute path is pure
functional JAX (params are explicit pytrees; every op is an init/apply pair),
designed for SPMD execution over `jax.sharding.Mesh` device meshes.

Subpackages
-----------
ops        core neural ops (dynamic conv, multi-context attention, adaptive
           embedding/softmax, positional encodings) — replaces tell/modules
models     decoders, task models, frozen backbone towers — replaces tell/models
parallel   mesh construction + sharding rules — replaces torch DataParallel
data       byte-BPE tokenizer, record datasets, bucketing — replaces tell/data
training   train loop, BertAdam-style optimizer, checkpointing — replaces
           tell/training
serving    batched decode server — replaces tell/server + tell/tasks
evalm      caption metrics (BLEU/ROUGE/CIDEr, entity P/R) — replaces
           scripts/compute_metrics.py
"""

__version__ = "0.1.0"
