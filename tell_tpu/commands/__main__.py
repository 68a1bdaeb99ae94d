"""`tnt` CLI — train / evaluate / preprocess / serve / score / bench.

Replaces the reference's docopt CLI (/root/reference/tell/commands/
__main__.py:3-97: `tell train CONFIG -f -r`, `tell evaluate CONFIG -m
MODEL`) with argparse subcommands over the YAML experiment configs in
expt/ (tell_tpu/config_io.py).
"""
from __future__ import annotations

import argparse
import json
import logging
import os
import sys


def _add_common(p):
    p.add_argument("config", help="experiment YAML (see expt/)")
    p.add_argument("-o", "--overrides", default=None,
                   help="JSON merged over the YAML config")
    p.add_argument("--compile-cache", default=None, metavar="DIR",
                   help="persistent XLA compilation cache directory: "
                   "first compile of each program is written there, "
                   "subsequent process starts load it instead of "
                   "recompiling (cuts server/trainer cold start from "
                   "minutes to seconds)")


def _enable_compile_cache(args) -> None:
    path = getattr(args, "compile_cache", None)
    if not path:
        return
    import jax
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # cache every program (the default 1 MiB floor skips the small decode
    # steps that dominate cold-start count)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="tnt",
                                description="TPU-native Transform-and-Tell")
    sub = p.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("train", help="train a model")
    _add_common(t)
    t.add_argument("-r", "--recover", action="store_true",
                   help="resume from the latest checkpoint")
    t.add_argument("--coordinator", default=None,
                   help="multi-host training: process 0's host:port for "
                   "the JAX coordination service (run the same command on "
                   "every host with its own --process-id)")
    t.add_argument("--num-processes", type=int, default=1)
    t.add_argument("--process-id", type=int, default=0)

    e = sub.add_parser("evaluate", help="decode a split and score it")
    _add_common(e)
    e.add_argument("-m", "--model", default=None,
                   help="checkpoint dir (default: <run>/checkpoints/best)")
    e.add_argument("-s", "--split", default="test")
    e.add_argument("-b", "--beam", type=int, default=1)
    e.add_argument("--limit", type=int, default=None)

    pre = sub.add_parser("preprocess", help="articles.jsonl -> shards")
    _add_common(pre)
    pre.add_argument("-s", "--split", default="train")

    sv = sub.add_parser("serve", help="start the caption HTTP service")
    _add_common(sv)
    sv.add_argument("-m", "--model", default=None)
    sv.add_argument("-p", "--port", type=int, default=5558)
    sv.add_argument("-b", "--max-batch", type=int, default=32)
    sv.add_argument("--host", default="127.0.0.1",
                    help="bind address (0.0.0.0 to expose; the service "
                    "has an unauthenticated /shutdown)")
    sv.add_argument("--attention", action="store_true",
                    help="include per-word attention maps in responses "
                    "(the demo page's shading)")
    sv.add_argument("--mesh-data", type=int, default=1,
                    help="shard each decode micro-batch over this many "
                    "devices (data-parallel serving; 1 = single chip)")
    sv.add_argument("--engine-slots", type=int, default=0,
                    help="continuous-batching beam decode with this many "
                    "request slots (0 = micro-batch mode); captioner and "
                    "transformer_modern families; composes with "
                    "--mesh-data (slots shard over the data axis)")
    sv.add_argument("--engine-beam", type=int, default=5,
                    help="beam size for --engine-slots mode")
    sv.add_argument("--engine-buckets", action="store_true",
                    help="one resident engine per article bucket: short "
                    "articles decode with proportionally smaller K/V "
                    "streams (identical captions; requests route to the "
                    "smallest bucket that fits)")
    sv.add_argument("--engine-length-penalty", type=float, default=0.0,
                    help="GNMT length penalty for --engine-slots ranking "
                    "(0 = raw log-prob, as in the reference)")
    sv.add_argument("--encode-batch", type=int, default=8,
                    help="coalesce up to this many concurrent requests' "
                    "article encodes into one tower pass before engine "
                    "admission (1 = per-request encode)")
    sv.add_argument("--warmup", action="store_true",
                    help="compile every decode shape before accepting "
                    "traffic (first-request latency -> startup time)")
    sv.add_argument("--numerics-ab", action="store_true",
                    help="decode one canned request with the int8 K/V "
                    "cache off vs on using the deployed weights and report "
                    "token agreement (also in /status) — the per-"
                    "deployment gate for the TPU int8 default")

    bn = sub.add_parser("bench", help="decode-throughput benchmark "
                        "(one JSON line; see bench.py)")
    bn.add_argument("-b", "--batch", type=int, default=64)
    bn.add_argument("--beam", type=int, default=5)
    bn.add_argument("--gen-len", type=int, default=100)

    sc = sub.add_parser("score", help="re-score a generations.jsonl")
    sc.add_argument("generations")
    sc.add_argument("-c", "--counters", default=None,
                    help="name_counters.pkl for rare-name P/R")

    tw = sub.add_parser("towers", help="frozen-tower utilities")
    tw.add_argument("action", choices=["verify"],
                    help="verify: probe converted checkpoints and print "
                         "activation checksums (docs/towers.md)")
    tw.add_argument("dir", help="towers dir (tools/convert_towers.py --out)")
    tw.add_argument("-t", "--tower", action="append", default=None,
                    help="restrict to specific towers (repeatable)")
    tw.add_argument("--json", action="store_true", dest="as_json")

    return p


def _load(args):
    from ..config_io import load_experiment
    return load_experiment(args.config, args.overrides)


def _adapter(exp):
    from ..models.registry import get_model
    return get_model(exp.model_type, exp.model)


def _article_len(exp) -> int:
    """Article token capacity from the model's context spec (512 in every
    reference config; long-article experiments raise it and ride the
    windowed RoBERTa encode)."""
    dcfg = getattr(exp.model, "decoder", exp.model)
    for c in getattr(dcfg, "contexts", ()):
        if c.name == "article":
            return c.max_len
    return 512


def _tokenizer(exp):
    from ..data.tokenizer import RobertaTokenizer
    return RobertaTokenizer.from_files(exp.data.vocab_file,
                                       exp.data.merges_file,
                                       max_len=_article_len(exp))


def _frozen_towers(exp):
    """Load converted frozen-tower weights if present in the run dir.

    The towers dir (shards_dir/../towers/<name>) is populated by
    tools/convert_towers.py; any of roberta / vit / resnet152 found there
    is loaded, so e.g. the 10_vit_modern experiment picks up its ViT image
    tower without extra config."""
    from ..models.backbones import RobertaConfig, init_roberta
    import jax
    rcfg = getattr(RobertaConfig, exp.data.roberta)()
    towers_dir = os.path.join(exp.data.shards_dir, "..", "towers")
    path = os.path.join(towers_dir, "roberta")
    if os.path.exists(path):
        import orbax.checkpoint as ocp
        roberta = ocp.PyTreeCheckpointer().restore(path)
    else:
        logging.warning("no converted RoBERTa weights at %s; using random "
                        "init (quality will be garbage — convert with "
                        "tools/convert_towers.py)", path)
        roberta = init_roberta(jax.random.PRNGKey(0), rcfg)
    frozen = {"roberta": roberta, "roberta_cfg": rcfg}
    vit_path = os.path.join(towers_dir, "vit")
    if os.path.exists(vit_path):
        import orbax.checkpoint as ocp
        from ..models.backbones.vit import ViTConfig
        frozen["vit"] = ocp.PyTreeCheckpointer().restore(vit_path)
        frozen["vit_cfg"] = ViTConfig.large()
    resnet_path = os.path.join(towers_dir, "resnet152")
    if os.path.exists(resnet_path):
        import orbax.checkpoint as ocp
        from ..models.backbones.resnet import ResNetConfig
        frozen["resnet"] = ocp.PyTreeCheckpointer().restore(resnet_path)
        frozen["resnet_cfg"] = ResNetConfig.resnet152()
    # serving vision towers (on-request face/object features)
    for name in ("mtcnn", "facenet", "yolov3"):
        path = os.path.join(towers_dir, name)
        if os.path.exists(path):
            import orbax.checkpoint as ocp
            frozen[name] = ocp.PyTreeCheckpointer().restore(path)
    return frozen


def _abstract_template(adapter):
    """The checkpoint-restore param template WITHOUT allocating a full
    set of randomly-initialized weights on the accelerator.

    orbax only needs the tree structure + shapes/dtypes, so trace init
    with eval_shape (zero device memory) and materialize host-side zero
    arrays (calloc — no pages touched until orbax overwrites them).
    Evaluate/serve previously ran the concrete init on-device; a fresh
    flagship param set next to the restored one was enough to push a
    post-train in-process evaluate over the v5e HBM limit."""
    import jax
    import numpy as np
    shapes = jax.eval_shape(
        lambda key: adapter.init(key, adapter.config),
        jax.random.PRNGKey(0))
    return jax.tree.map(lambda s: np.zeros(s.shape, s.dtype), shapes)


def _restore_params(exp, model_dir, template):
    import orbax.checkpoint as ocp
    path = model_dir or os.path.join(exp.trainer.serialization_dir,
                                     "checkpoints", "best")
    # orbax rejects relative paths; expt YAMLs use repo-relative run dirs
    path = os.path.abspath(path)
    state = ocp.PyTreeCheckpointer().restore(path, item={"params": template})
    return state["params"]


def cmd_train(args) -> int:
    _enable_compile_cache(args)
    from ..data.bucketing import bucket_batches
    from ..data.records import RecordDataset
    from ..training.trainer import Trainer

    pi, pc = 0, 1
    if args.coordinator is not None:
        # must run before the JAX backend initializes; afterwards
        # jax.devices() is global and the trainer mesh spans all hosts.
        # NOTE: use a single-shape bucketing config (one article/caption
        # length) so every process compiles and runs identical batch
        # schedules — see docs/parallelism.md.
        from ..parallel.multihost import init_multihost
        init_multihost(args.coordinator, args.num_processes,
                       args.process_id)
        pi, pc = args.process_id, args.num_processes

    exp = _load(args)
    if pc > 1:
        bk = exp.bucketing
        if len(bk.article_lengths) > 1 or len(bk.caption_lengths) > 1:
            # divergent per-process batch-shape schedules deadlock at the
            # first collective with no diagnostic — refuse up front
            raise SystemExit(
                "multi-host training requires a single-shape bucketing "
                "config (one article length, one caption length) so every "
                f"process runs an identical batch schedule; got "
                f"article_lengths={bk.article_lengths} "
                f"caption_lengths={bk.caption_lengths}")
    train_ds = RecordDataset(os.path.join(exp.data.shards_dir,
                                          "train-*.npz"), seed=exp.data.seed)
    val_ds = RecordDataset(os.path.join(exp.data.shards_dir, "valid-*.npz"),
                           seed=exp.data.seed)

    def train_batches(epoch):
        # epoch_index-seeded order: a pure function of (seed, epoch) so a
        # recovered run reproduces the interrupted epoch's batch schedule
        # exactly (mid-epoch cursor resume, trainer.py)
        return bucket_batches(
            train_ds.epoch(lazy=True, limit=exp.data.instances_per_epoch,
                           process_index=pi, process_count=pc,
                           epoch_index=epoch),
            exp.bucketing)

    def val_batches():
        return bucket_batches(
            val_ds.epoch(lazy=True, shuffle=False, limit=exp.data.val_limit,
                         process_index=pi, process_count=pc),
            exp.bucketing)

    trainer = Trainer(exp.model, exp.trainer, train_batches, val_batches,
                      frozen=_frozen_towers(exp), adapter=_adapter(exp))
    if args.recover:
        # fail fast like the reference (allennlp train --recover errors when
        # there is nothing to recover): a silent fresh run mislabeled as a
        # resume poisons downstream artifacts (quality_loop journals)
        if not trainer.recover():
            print(f"train -r: no checkpoint to recover in "
                  f"{exp.trainer.serialization_dir}", file=sys.stderr)
            return 1
    result = trainer.train()
    print(json.dumps(result))
    return 0


def cmd_evaluate(args) -> int:
    _enable_compile_cache(args)
    import jax
    from .evaluate import evaluate_split

    exp = _load(args)
    adapter = _adapter(exp)
    params = _restore_params(exp, args.model, _abstract_template(adapter))
    # one host->device transfer up front; orbax restores numpy arrays and
    # feeding those to the per-batch jits would re-upload params/towers
    # every batch (frozen holds non-array cfg leaves — transfer arrays only)
    put = lambda tree: jax.tree.map(  # noqa: E731
        lambda x: jax.device_put(x) if hasattr(x, "shape") else x, tree)
    from ..ops.quant import maybe_quantize_frozen  # TELL_TPU_ENC8 lever
    metrics = evaluate_split(exp, put(params),
                             put(maybe_quantize_frozen(_frozen_towers(exp))),
                             _tokenizer(exp), split=args.split,
                             beam_size=args.beam, limit=args.limit,
                             adapter=adapter)
    print(json.dumps(metrics, indent=2))
    return 0


def cmd_preprocess(args) -> int:
    from ..data.pipeline import (load_objects_jsonl, make_image_grid_fn,
                                 preprocess_split, read_articles_jsonl)

    exp = _load(args)
    glove = None
    if exp.data.glove_file:
        from ..data.glove import GloveVectors
        glove = GloveVectors.from_file(exp.data.glove_file)
    objects_lookup = None
    if exp.data.objects_jsonl:
        objects_lookup = load_objects_jsonl(exp.data.objects_jsonl)
    image_grid_fn = None
    if exp.data.images_dir:
        towers_dir = os.path.join(exp.data.shards_dir, "..", "towers")
        image_grid_fn = make_image_grid_fn(exp.data.images_dir, towers_dir)
    n = preprocess_split(
        read_articles_jsonl(exp.data.articles_jsonl), _tokenizer(exp),
        exp.reader, exp.data.shards_dir, args.split, glove=glove,
        image_grid_fn=image_grid_fn, objects_lookup=objects_lookup)
    print(json.dumps({"examples": n, "split": args.split}))
    return 0


def cmd_serve(args) -> int:
    _enable_compile_cache(args)
    import jax
    from ..serving import CaptionService, serve

    exp = _load(args)
    adapter = _adapter(exp)
    params = _restore_params(exp, args.model, _abstract_template(adapter))
    mesh = None
    if args.mesh_data > 1:
        from ..parallel import make_mesh
        mesh = make_mesh(n_data=args.mesh_data, n_model=1)
    service = CaptionService(params, _frozen_towers(exp), exp.model,
                             _tokenizer(exp), adapter=adapter,
                             max_batch=args.max_batch, mesh=mesh,
                             need_attention=args.attention,
                             engine_slots=args.engine_slots,
                             engine_beam=args.engine_beam,
                             engine_length_penalty=args.engine_length_penalty,
                             engine_buckets=args.engine_buckets,
                             encode_batch=args.encode_batch)
    if args.warmup:
        w = service.warmup()
        print(f"warmed decode shapes {w['compiled']} "
              f"in {w['seconds']:.1f}s")
    if args.numerics_ab:
        ab = service.numerics_ab()
        print(f"numerics A/B: int8-KV token agreement "
              f"{ab['kv8_token_agreement']:.3f} "
              f"(active mode: {ab['kv_cache_mode']}, "
              f"{ab['seconds']:.1f}s)")
    print(f"serving on {args.host}:{args.port}"
          + (f" (data-parallel x{args.mesh_data})" if mesh else "")
          + (f" (continuous batching: {args.engine_slots} slots, "
             f"beam {args.engine_beam})" if args.engine_slots else ""))
    try:
        serve(service, port=args.port, host=args.host)
    finally:
        # /shutdown (or Ctrl-C) unblocked serve_forever; drain in-flight
        # requests before the interpreter exits and kills the daemon
        # threads mid-decode. close() blocks until any concurrent close
        # (the /shutdown stop thread) has finished.
        service.close()
    return 0


def cmd_bench(args) -> int:
    # explicit CLI flags win over stale exported BENCH_* vars
    os.environ["BENCH_BATCH"] = str(args.batch)
    os.environ["BENCH_BEAM"] = str(args.beam)
    os.environ["BENCH_GEN_LEN"] = str(args.gen_len)
    repo = os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    sys.path.insert(0, repo)
    import bench
    bench.main()
    return 0


def cmd_score(args) -> int:
    from .evaluate import score_file
    print(json.dumps(score_file(args.generations, args.counters), indent=2))
    return 0


def cmd_towers(args) -> int:
    from .towers import verify
    return verify(args.dir, towers=args.tower, as_json=args.as_json)


def main(argv=None) -> int:
    logging.basicConfig(level=logging.INFO)
    args = build_parser().parse_args(argv)
    return {"train": cmd_train, "evaluate": cmd_evaluate,
            "preprocess": cmd_preprocess, "serve": cmd_serve,
            "score": cmd_score, "bench": cmd_bench,
            "towers": cmd_towers}[args.cmd](args)


if __name__ == "__main__":
    sys.exit(main())
