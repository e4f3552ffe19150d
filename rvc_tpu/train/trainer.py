"""Training driver: epoch loop, checkpoint/resume, validation, metrics.

Parity target: the orchestration of reference rvc/train/train.py:302-1600 —
seeded 90/10 split, bucket-sampled epochs, warmup+exponential LR, rolling
50-step metric windows, per-save-epoch validation (mel-L1 / mrSTFT / SI-SDR
[/ PESQ when the C library exists]), G/D checkpoints with resume, deployable
weights-only export, reference-sample rendering.

TPU-first: one process drives the whole mesh (no mp.spawn/DDP — the jitted
step is SPMD over the dp axis); metrics stream to a JSONL file (and
TensorBoard if available); checkpoints are our .npz format.
"""

from __future__ import annotations

import dataclasses
import glob
import json
import os
import re
import threading
import time
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..configs import ExperimentConfig
from ..models.discriminators import MultiPeriodDiscriminator
from ..models.synthesizer import Synthesizer
from ..ops.stft import mel_spectrogram
from ..utils.checkpoints import load_checkpoint, save_checkpoint
from . import losses as L
from .data import BucketBatcher, VCDataset, parse_filelist, train_val_split
from .optimizers import make_optimizer
from .schedules import make_epoch_lr_schedule
from .step import TrainState, create_train_state, make_train_step

# Cross-thread stop request: signal handlers only install on the main
# thread, so when fit() runs in a worker thread (the UI's Start Training
# button) the epoch-boundary checkpoint path needs an explicit flag.
_STOP_EVENT = threading.Event()


def request_stop() -> None:
    """Ask any in-process Trainer.fit loop to checkpoint and exit at the
    next epoch boundary. Thread-safe. fit() never clears the flag itself —
    a stop requested during the minutes-long init/compile must survive
    until the first epoch check — so launchers that reuse the process
    (the UI's Start Training) call reset_stop() BEFORE spawning the run."""
    _STOP_EVENT.set()


def reset_stop() -> None:
    """Clear a stale stop flag. Call before launching a new in-process run
    (after any previous run has exited), never between launch and stop."""
    _STOP_EVENT.clear()


class MetricsLogger:
    """JSONL + optional TensorBoard scalars. Window-averaged loss scalars
    (the reference's 50-step avg_50_cache smoothing, train.py:988-1003) are
    computed in train_epoch from the device-side running sums and logged
    under `avg50/` — no per-step host fetches."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self.path = os.path.join(log_dir, "metrics.jsonl")
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir=log_dir, flush_secs=86400)
        except Exception:
            pass

    def log(self, step: int, scalars: Dict[str, float], prefix: str = "") -> None:
        rec = {"step": step}
        for k, v in scalars.items():
            rec[f"{prefix}{k}"] = float(v)
        self._file.write(json.dumps(rec) + "\n")
        if self._tb is not None:
            for k, v in rec.items():
                if k != "step":
                    self._tb.add_scalar(k, v, step)

    def flush(self) -> None:
        self._file.flush()
        if self._tb is not None:
            self._tb.flush()


@dataclasses.dataclass
class TrainerArgs:
    exp_dir: str
    total_epochs: int = 200
    save_every_epoch: int = 10
    save_only_latest: bool = False
    pretrain_g: str = ""
    pretrain_d: str = ""
    discriminators: str = "mpd"        # comma list from the registry
    # multi-host jobs: orbax sharded checkpoints (each host writes its own
    # shard) alongside the portable host-0 .npz artifacts
    use_orbax: bool = False
    cache_data: bool = False  # device-resident dataset (ref cache_data_in_gpu)
    batch_size: Optional[int] = None
    optimizer: Optional[str] = None
    warmup_epochs: Optional[int] = None
    # custom per-network LRs (reference --use_custom_lr/--custom_lr_g/_d,
    # train.py:662-668); None = the config's shared learning_rate
    lr_g: Optional[float] = None
    lr_d: Optional[float] = None
    # export the deployable weights file on every save epoch (reference
    # --save_every_weights; the final epoch always exports)
    save_every_weights: bool = True
    # restrict the mesh to these jax.devices() indices (reference --gpu)
    device_indices: Optional[Tuple[int, ...]] = None
    seed: int = 1234


def _latest_checkpoint(exp_dir: str, prefix: str) -> Optional[str]:
    """Numeric-sorted latest ckpt (reference utils.py:131-152)."""
    paths = glob.glob(os.path.join(exp_dir, f"{prefix}_*.npz"))
    if not paths:
        return None

    def num(p):
        m = re.search(rf"{prefix}_(\d+)\.npz$", p)
        return int(m.group(1)) if m else -1

    return max(paths, key=num)


class Trainer:
    def __init__(self, cfg: ExperimentConfig, args: TrainerArgs):
        self.cfg = cfg
        self.args = args
        if args.batch_size:
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, batch_size=args.batch_size)
            )
        if args.optimizer:
            cfg = dataclasses.replace(
                cfg, train=dataclasses.replace(cfg.train, optimizer=args.optimizer)
            )
        if args.warmup_epochs is not None:
            cfg = dataclasses.replace(
                cfg,
                train=dataclasses.replace(cfg.train, warmup_epochs=args.warmup_epochs),
            )
        self.cfg = cfg

        rows = parse_filelist(os.path.join(args.exp_dir, "filelist.txt"))
        train_rows, val_rows = train_val_split(rows, 0.1, seed=args.seed)
        d = cfg.data
        self.train_ds = VCDataset(
            train_rows, d.sample_rate, d.filter_length, d.hop_length, d.win_length
        )
        self.val_ds = VCDataset(
            val_rows, d.sample_rate, d.filter_length, d.hop_length, d.win_length
        ) if val_rows else None

        n_hosts = jax.process_count()
        self.batcher = BucketBatcher(
            self.train_ds,
            cfg.train.batch_size,
            shard_index=jax.process_index(),
            num_shards=n_hosts,
        )
        spe = max(1, self.batcher.steps_per_epoch())
        self.steps_per_epoch = spe

        self.model_g = Synthesizer.from_config(cfg)
        names = [n.strip() for n in args.discriminators.split(",") if n.strip()]
        self._disc_names = names
        if names == ["mpd"]:
            self.model_d = MultiPeriodDiscriminator(
                use_spectral_norm=cfg.model.use_spectral_norm)
        else:
            from ..models.custom_discriminators import build_discriminator

            self.model_d = build_discriminator(names, cfg.data.sample_rate)

        sched_g = make_epoch_lr_schedule(
            args.lr_g or cfg.train.learning_rate, spe,
            cfg.train.warmup_epochs, cfg.train.lr_decay,
        )
        sched_d = sched_g if args.lr_d is None else make_epoch_lr_schedule(
            args.lr_d, spe, cfg.train.warmup_epochs, cfg.train.lr_decay,
        )
        self.tx_g = make_optimizer(cfg.train.optimizer, sched_g)
        self.tx_d = make_optimizer(cfg.train.optimizer, sched_d)

        self.step_fn = make_train_step(
            cfg, self.model_g, self.model_d, self.tx_g, self.tx_d, spe,
            lr_schedule=sched_g,
        )

        from ..parallel import make_mesh_for_batch, shard_batch, shard_train_step

        mesh_devices = None
        if args.device_indices is not None:
            all_devices = jax.devices()
            mesh_devices = [all_devices[i] for i in args.device_indices]
        # global batch = per-host batch x hosts (BucketBatcher yields
        # batch_size rows per host; shard_batch assembles the global array)
        self.mesh = make_mesh_for_batch(
            cfg.train.batch_size * n_hosts, devices=mesh_devices)
        self.jstep = shard_train_step(self.step_fn, self.mesh)
        self._shard_batch = lambda b: shard_batch(b, self.mesh)

        self.logger = MetricsLogger(args.exp_dir)
        self.state: Optional[TrainState] = None
        self.start_epoch = 1

        self._device_cache = None
        if args.cache_data:
            if n_hosts > 1:
                print("cache_data: multi-host run — per-host device caching "
                      "is not supported; streaming batches instead")
            else:
                from .data import DeviceDataCache

                est = DeviceDataCache.estimate_bytes(
                    self.train_ds, self.batcher,
                    spec_dim=cfg.data.spec_channels)
                limit = 6 << 30  # leave HBM headroom for model + optimizer
                if est > limit:
                    print(f"cache_data: dataset ~{est / 1e9:.1f} GB exceeds "
                          f"the {limit / 1e9:.0f} GB cache budget; streaming "
                          "batches instead")
                else:
                    print(f"cache_data: uploading ~{est / 1e9:.2f} GB of "
                          "padded examples to the device (one-time)")
                    self._device_cache = DeviceDataCache(
                        self.train_ds, self.batcher)

    # -- state management ---------------------------------------------------

    def _example_batch(self):
        it = self.batcher(epoch=0)
        return next(iter(it))

    def init_state(self) -> None:
        batch = {k: jnp.asarray(v) for k, v in self._example_batch().items()}
        # jit the whole initialization: one compiled program instead of
        # thousands of eager op dispatches (critical through remote devices)
        init_fn = jax.jit(
            lambda rng, b: create_train_state(
                rng, self.cfg, self.model_g, self.model_d,
                self.tx_g, self.tx_d, b,
            )
        )
        self.state = init_fn(jax.random.PRNGKey(self.args.seed), batch)
        jax.block_until_ready(self.state.params_g)
        if self.args.use_orbax:
            from ..utils.orbax_io import latest_step_dir, restore_state

            ck = latest_step_dir(self.args.exp_dir)
            if ck is not None:
                self.state = restore_state(ck, self.state)
                epoch = int(os.path.basename(ck).split("_")[-1])
                self.start_epoch = epoch + 1
                print(f"resumed from orbax checkpoint epoch {epoch}")
                return
        g_path = _latest_checkpoint(self.args.exp_dir, "G")
        d_path = _latest_checkpoint(self.args.exp_dir, "D")
        if g_path and d_path:
            self._resume(g_path, d_path)
        else:
            self._load_pretrained()

    def _resume(self, g_path: str, d_path: str) -> None:
        params_g, meta_g = load_checkpoint(g_path)
        params_d, meta_d = load_checkpoint(d_path)
        epoch = int(meta_g.get("epoch", 0))
        self.state = self.state.replace(
            params_g=params_g["model"],
            params_d=params_d["model"],
            step=jnp.asarray(epoch * self.steps_per_epoch, jnp.int32),
        )
        if "balancer" in params_g and self.state.balancer is not None:
            self.state = self.state.replace(
                balancer={k: jnp.asarray(v)
                          for k, v in params_g["balancer"].items()}
            )
            if "balancer_opt" in params_g and self.state.opt_b is not None:
                try:
                    self.state = self.state.replace(
                        opt_b=_restore_opt_state(
                            self.state.opt_b, params_g["balancer_opt"])
                    )
                except Exception as e:
                    print(f"balancer opt-state restore failed ({e}); fresh")
        if "optimizer" in params_g:
            try:
                self.state = self.state.replace(
                    opt_g=_restore_opt_state(self.state.opt_g, params_g["optimizer"]),
                    opt_d=_restore_opt_state(self.state.opt_d, params_d["optimizer"]),
                )
            except Exception as e:
                print(f"optimizer state restore failed ({e}); fresh optimizer")
        self.start_epoch = epoch + 1
        print(f"resumed from epoch {epoch}")

    def _load_pretrained(self) -> None:
        for path, attr in ((self.args.pretrain_g, "params_g"),
                           (self.args.pretrain_d, "params_d")):
            if path and path != "None" and os.path.exists(path):
                if path.endswith(".npz"):
                    params, _ = load_checkpoint(path)
                    params = params.get("model", params)
                else:  # torch .pth pretrain
                    from ..utils.checkpoints import load_rvc_pth

                    params, _ = load_rvc_pth(path)
                # the auto-selected pretrains are MPD/NSF-shaped; loading one
                # into a different architecture (e.g. --discriminators mrd)
                # would swap in a structurally incompatible tree and fail
                # minutes later inside the compiled step — validate up front
                cur = getattr(self.state, attr)
                if _tree_signature(params) != _tree_signature(cur):
                    print(
                        f"pretrained {attr} at {path} does not match the "
                        f"configured architecture; skipping it"
                    )
                    continue
                self.state = self.state.replace(**{attr: params})
                print(f"loaded pretrained {attr} from {path}")

    def save(self, epoch: int) -> None:
        if self.args.use_orbax:
            from ..utils.orbax_io import save_state

            save_state(
                os.path.join(self.args.exp_dir, f"orbax_{epoch}"), self.state
            )
            if self.args.save_only_latest and jax.process_index() == 0:
                _prune_orbax_dirs(self.args.exp_dir, keep_epoch=epoch)
            if jax.process_index() != 0:
                return  # only host 0 writes the portable .npz artifacts
        suffix = 2333333 if self.args.save_only_latest else epoch
        m, d = self.cfg.model, self.cfg.data
        meta = {"epoch": epoch, "sample_rate": d.sample_rate,
                "vocoder": self.cfg.model.vocoder,
                # 18-element deployable config list (reference
                # extract_model.py embeds it in every export;
                # derive_synth_arch consumes it) so checkpoints stay
                # loadable even when the architecture differs from the
                # sample-rate preset
                "config": [
                    d.filter_length // 2 + 1, 32,
                    m.inter_channels, m.hidden_channels, m.filter_channels,
                    m.n_heads, m.n_layers, m.kernel_size, m.p_dropout, 1,
                    list(m.resblock_kernel_sizes),
                    [list(t) for t in m.resblock_dilation_sizes],
                    list(m.upsample_rates), m.upsample_initial_channel,
                    list(m.upsample_kernel_sizes), m.spk_embed_dim,
                    m.gin_channels, d.sample_rate,
                ]}
        g_tree = {"model": self.state.params_g,
                  "optimizer": _opt_state_arrays(self.state.opt_g)}
        if self.state.balancer is not None:
            # learned uncertainty log-sigmas + their Adam moments must
            # survive resume
            g_tree["balancer"] = self.state.balancer
            if self.state.opt_b is not None:
                g_tree["balancer_opt"] = _opt_state_arrays(self.state.opt_b)
        save_checkpoint(
            os.path.join(self.args.exp_dir, f"G_{suffix}.npz"),
            g_tree,
            meta,
        )
        save_checkpoint(
            os.path.join(self.args.exp_dir, f"D_{suffix}.npz"),
            {"model": self.state.params_d,
             "optimizer": _opt_state_arrays(self.state.opt_d)},
            meta,
        )
        # deployable weights-only export (extract_model.py parity: fp16
        # weights, no posterior encoder, embedded metadata); gated per save
        # epoch by save_every_weights (reference train.py:1418), final
        # epoch always exports
        model_name = os.path.basename(os.path.normpath(self.args.exp_dir))
        if self.args.save_every_weights or epoch >= self.args.total_epochs:
            deploy = {
                k: v for k, v in self.state.params_g.items() if k != "enc_q"
            }
            deploy = jax.tree.map(lambda a: np.asarray(a, np.float16), deploy)
            save_checkpoint(
                os.path.join(self.args.exp_dir, f"{model_name}_{epoch}e.npz"),
                deploy,
                {**meta, "f0": int(self.cfg.model.use_f0),
                 "version": "v2", "epochs": epoch},
            )
            if self.cfg.model.vocoder == "HiFi-GAN":
                # reference-loadable deployable (.pth, extract_model.py
                # format); the exporter covers the NSF decoder only
                try:
                    from ..utils.export_torch import export_rvc_pth

                    export_rvc_pth(
                        jax.device_get(self.state.params_g),
                        os.path.join(self.args.exp_dir,
                                     f"{model_name}_{epoch}e.pth"),
                        sr=self.cfg.data.sample_rate,
                        vocoder=self.cfg.model.vocoder,
                        cfg=self.cfg,
                        epoch=epoch,
                        step=int(self.state.step),
                        name=model_name,
                        n_enc_layers=self.cfg.model.n_layers,
                    )
                except Exception as e:
                    print(f".pth deployable export skipped ({e})")
        if self.cfg.model.vocoder == "HiFi-GAN":
            # full-format G ckpt: the layout the reference's pretrained-G
            # path strict-loads (train.py:755-765) for fine-tuning
            try:
                from ..utils.export_torch import export_rvc_g_pth

                export_rvc_g_pth(
                    jax.device_get(self.state.params_g),
                    os.path.join(self.args.exp_dir, f"G_{suffix}.pth"),
                    epoch=epoch,
                    learning_rate=self.cfg.train.learning_rate,
                    n_enc_layers=self.cfg.model.n_layers,
                    wn_layers_posterior=getattr(
                        self.model_g, "posterior_layers", 16),
                    wn_layers_flow=getattr(self.model_g, "flow_layers", 3),
                )
            except Exception as e:
                print(f"G .pth full export skipped ({e})")
        if self._disc_names == ["mpd"]:
            # reference-loadable full D ckpt (utils.py save layout) so a
            # run trained here can seed the reference's pretrained-D path
            try:
                from ..utils.export_torch import export_rvc_d_pth

                export_rvc_d_pth(
                    jax.device_get(self.state.params_d),
                    os.path.join(self.args.exp_dir, f"D_{suffix}.pth"),
                    epoch=epoch,
                    learning_rate=self.cfg.train.learning_rate,
                    periods=tuple(getattr(self.model_d, "periods", ())
                                  or (2, 3, 5, 7, 11, 17, 23, 37)),
                )
            except Exception as e:
                print(f"D .pth export skipped ({e})")

    # -- loops --------------------------------------------------------------

    def _prefetch(self, iterator, depth: int = 2):
        """Background-thread prefetch: host-side loading/padding overlaps the
        device step (the reference relies on DataLoader workers; here one
        thread suffices since batches are numpy assembly, not decode)."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        sentinel = object()
        failure: list = []

        def worker():
            try:
                for item in iterator:
                    q.put(item)
            except BaseException as e:  # propagate to the consumer, not stderr
                failure.append(e)
            finally:
                q.put(sentinel)

        threading.Thread(target=worker, daemon=True).start()
        while True:
            item = q.get()
            if item is sentinel:
                if failure:
                    raise failure[0]
                return
            yield item

    def train_epoch(self, epoch: int, rng: jax.Array) -> Dict[str, float]:
        t0 = time.time()
        # Keep per-step metrics on device: a float()/int() per step is a
        # blocking host round trip (~tunnel RTT each) that serializes device
        # and host. Sums accumulate as async device adds; only the 50-step
        # log points and the epoch end fetch.
        sums_dev = None
        last_dev = None
        step0 = int(self.state.step)
        n = 0
        prev_sums = None
        prev_n = 0
        if self._device_cache is not None:
            # device-resident data: per-step batches are device gathers,
            # no host->device transfer and no host prefetch thread needed
            batches = (
                self._device_cache.batch(frames, ids)
                for frames, ids in self.batcher.epoch_batches(epoch)
            )
        else:
            batches = self._prefetch(self.batcher(epoch=epoch))
        for batch in batches:
            rng, sub = jax.random.split(rng)
            self.state, metrics = self.jstep(self.state, self._shard_batch(batch), sub)
            n += 1
            last_dev = metrics
            sums_dev = (
                metrics if sums_dev is None
                else {k: sums_dev[k] + v for k, v in metrics.items()}
            )
            step = step0 + n
            if step % 50 == 0:
                # one fetch yields both the snapshot and the running sums —
                # a single blocking round trip through the tunnel, and the
                # two dicts are a consistent cut (reference avg_50_cache)
                host_raw, sums_raw = jax.device_get((metrics, sums_dev))
                host = {k: float(v) for k, v in host_raw.items()}
                sums = {k: float(v) for k, v in sums_raw.items()}
                w = max(n - prev_n, 1)
                for k, v in sums.items():
                    host[f"avg50/{k}"] = (v - (prev_sums or {}).get(k, 0.0)) / w
                prev_sums, prev_n = sums, n
                self.logger.log(step, host, prefix="train/")
        last_metrics = (
            {k: float(v) for k, v in jax.device_get(last_dev).items()}
            if last_dev is not None else {}
        )
        sums = (
            {k: float(v) for k, v in jax.device_get(sums_dev).items()}
            if sums_dev is not None else {}
        )
        avg = {f"avg/{k}": v / max(n, 1) for k, v in sums.items()}
        avg["epoch_seconds"] = time.time() - t0
        avg["steps_per_sec"] = n / max(avg["epoch_seconds"], 1e-9)
        self.logger.log(int(self.state.step), avg, prefix="epoch/")
        return {**last_metrics, **avg}

    def validate(self, rng: jax.Array,
                 max_items: Optional[int] = None) -> Dict[str, float]:
        """Hold-out metrics via net_g.infer (reference validation_loop,
        train.py:1478-1579): mel-L1, mrSTFT, SI-SDR, PESQ-WB. Covers the
        full 10% split like the reference (cap with max_items for smoke
        tests). PESQ uses the C wheel when importable, otherwise the numpy
        P.862.2 estimator (utils/pesq_np.py)."""
        if self.val_ds is None or len(self.val_ds) == 0:
            return {}
        if max_items is None:
            max_items = len(self.val_ds)
        d = self.cfg.data
        mel_l1s, mrstfts, sisdrs, pesqs = [], [], [], []
        pesq_is_itu = False
        for i in range(min(len(self.val_ds), max_items)):
            ex = self.val_ds[i]
            n = int(ex["length"])
            if n < 16:
                continue
            # pad to a 100-frame bucket so jit compiles a handful of shapes
            n_pad = -(-n // 100) * 100
            phone = np.zeros((1, n_pad, ex["phone"].shape[1]), np.float32)
            phone[0, :n] = ex["phone"]
            pitch = np.zeros((1, n_pad), np.int32)
            pitch[0, :n] = ex["pitch"]
            pitchf = np.zeros((1, n_pad), np.float32)
            pitchf[0, :n] = ex["pitchf"]
            phone = jnp.asarray(phone)
            pitch = jnp.asarray(pitch)
            pitchf = jnp.asarray(pitchf)
            lengths = jnp.asarray([n], jnp.int32)
            sid = jnp.asarray([int(ex["sid"])], jnp.int32)
            rng, sub = jax.random.split(rng)
            audio, _ = self._get_jit_infer()(
                self.state.params_g, phone, lengths, pitch, pitchf, sid, sub
            )
            y_hat = np.asarray(audio[0, :, 0])
            y_ref = ex["wave"][: len(y_hat)]
            y_hat = y_hat[: len(y_ref)]
            if len(y_ref) < d.hop_length * 4:
                continue
            mel_r = mel_spectrogram(
                jnp.asarray(y_ref[None]), d.filter_length, d.n_mel_channels,
                d.sample_rate, d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax,
            )
            mel_h = mel_spectrogram(
                jnp.asarray(y_hat[None]), d.filter_length, d.n_mel_channels,
                d.sample_rate, d.hop_length, d.win_length, d.mel_fmin, d.mel_fmax,
            )
            mel_l1s.append(float(jnp.mean(jnp.abs(mel_r - mel_h))))
            mrstfts.append(float(L.multi_resolution_stft_loss(
                jnp.asarray(y_ref[None]), jnp.asarray(y_hat[None]))))
            sisdrs.append(float(L.si_sdr(
                jnp.asarray(y_hat[None]), jnp.asarray(y_ref[None]))))
            try:
                from ..utils.audio_io import resample

                ref16 = resample(y_ref, d.sample_rate, 16000)
                hat16 = resample(y_hat, d.sample_rate, 16000)
                try:
                    from pesq import pesq as pesq_fn  # ITU C wheel, preferred

                    pesqs.append(float(pesq_fn(16000, ref16, hat16, "wb")))
                    pesq_is_itu = True
                except ImportError:
                    from ..utils.pesq_np import pesq_wb

                    pesqs.append(pesq_wb(ref16, hat16))
            except Exception:
                pass
        out = {}
        if mel_l1s:
            out["validation/loss/mel_l1"] = float(np.mean(mel_l1s))
            out["validation/loss/mrstft"] = float(np.mean(mrstfts))
            out["validation/score/si_sdr"] = float(np.mean(sisdrs))
        if pesqs:
            # honest naming: only the ITU C wheel logs under "pesq"; the
            # numpy estimator (utils/pesq_np.py, uncalibrated vs P.862.2)
            # logs as "pesq_est" so the score is never mistaken for real
            # PESQ (see scripts/calibrate_pesq.py for the calibration
            # harness usable in wheel-equipped environments).
            key = "pesq" if pesq_is_itu else "pesq_est"
            out[f"validation/score/{key}"] = float(np.mean(pesqs))
        if out:
            self.logger.log(int(self.state.step), out)
        return out

    def _get_jit_infer(self):
        """One jitted net_g.infer graph shared by validate and
        render_reference — eager apply dispatches thousands of individual
        ops over the remote-device tunnel (see init_state)."""
        if not hasattr(self, "_jit_infer"):
            infer = type(self.model_g).infer
            self._jit_infer = jax.jit(
                lambda params, phone, lengths, pitch, pitchf, sid, rng:
                self.model_g.apply(
                    {"params": params}, phone, lengths, pitch, pitchf, sid,
                    method=infer, rngs={"noise": rng},
                )
            )
        return self._jit_infer

    def render_reference(self, epoch: int, rng: jax.Array) -> Optional[str]:
        """Golden-input regression probe: render logs/reference/{ref_feats,
        ref_f0c, ref_f0f}.npy through net_g.infer each save epoch (reference
        train.py:824-872,1364-1380 logs it as TB audio; we write a wav)."""
        ref_dir = os.path.join("logs", "reference")
        paths = [os.path.join(ref_dir, n) for n in
                 ("ref_feats.npy", "ref_f0c.npy", "ref_f0f.npy")]
        if not all(os.path.exists(p) for p in paths):
            return None
        feats = np.load(paths[0])
        f0c = np.load(paths[1])
        f0f = np.load(paths[2])
        phone_r = np.repeat(feats, 2, axis=0)
        n = min(len(phone_r), len(f0c), len(f0f))
        # pad to the same 100-frame buckets validate uses so the shared
        # jitted graph reuses a compiled shape
        n_pad = -(-n // 100) * 100
        phone = np.zeros((1, n_pad, phone_r.shape[1]), np.float32)
        phone[0, :n] = phone_r[:n]
        pitch = np.zeros((1, n_pad), np.int32)
        pitch[0, :n] = f0c[:n]
        pitchf = np.zeros((1, n_pad), np.float32)
        pitchf[0, :n] = f0f[:n]
        audio, _ = self._get_jit_infer()(
            self.state.params_g,
            jnp.asarray(phone),
            jnp.asarray([n], jnp.int32),
            jnp.asarray(pitch),
            jnp.asarray(pitchf),
            jnp.zeros((1,), jnp.int32),
            rng,
        )
        from ..utils.audio_io import write_wav

        # trim the bucket padding: one frame decodes to hop_length samples
        wav = np.asarray(audio[0, :, 0])[: n * self.cfg.data.hop_length]
        out = os.path.join(self.args.exp_dir, f"reference_e{epoch}.wav")
        write_wav(out, wav, self.cfg.data.sample_rate)
        self._log_spectrogram_image(wav, epoch)
        return out

    def _log_spectrogram_image(self, wav: np.ndarray, epoch: int) -> None:
        """Save (and TB-log when available) a mel spectrogram image of the
        reference render, like the reference's per-save-epoch
        plot_spectrogram_to_numpy slides (train.py:1354-1388)."""
        try:
            d = self.cfg.data
            from .data import spectrogram_np
            from ..ops.stft import mel_filterbank

            spec = spectrogram_np(
                wav, d.filter_length, d.hop_length, d.win_length)
            fb = mel_filterbank(d.sample_rate, d.filter_length,
                                d.n_mel_channels, d.mel_fmin,
                                d.mel_fmax or d.sample_rate / 2)
            mel_db = np.log(np.maximum(spec @ fb.T, 1e-5)).T  # [mels, T]
            import matplotlib

            matplotlib.use("Agg")
            import matplotlib.pyplot as plt

            fig, ax = plt.subplots(figsize=(10, 3))
            im = ax.imshow(mel_db, aspect="auto", origin="lower",
                           interpolation="none")
            fig.colorbar(im, ax=ax)
            ax.set_title(f"reference mel (epoch {epoch})")
            fig.tight_layout()
            png = os.path.join(self.args.exp_dir, f"reference_e{epoch}.png")
            fig.savefig(png, dpi=100)
            if self.logger._tb is not None:
                fig.canvas.draw()
                img = np.asarray(fig.canvas.buffer_rgba())[..., :3]
                self.logger._tb.add_image(
                    "reference/mel", img, epoch, dataformats="HWC")
            plt.close(fig)
        except Exception as e:
            print(f"spectrogram image skipped ({e})")

    def _write_heartbeat(self, epoch: int) -> None:
        """Liveness probe for external monitors (the reference only exposes
        child PIDs in config.json, train.py:343-370; this gives step/epoch/
        timestamp so a supervisor can detect stalls, not just death)."""
        hb = {
            "epoch": epoch,
            "step": int(self.state.step) if self.state is not None else 0,
            "time": time.time(),
            "process_index": jax.process_index(),
            "pid": os.getpid(),
        }
        try:
            with open(os.path.join(self.args.exp_dir, "heartbeat.json"), "w") as f:
                json.dump(hb, f)
        except OSError:
            pass

    def fit(self) -> None:
        # no _STOP_EVENT.clear() here: a stop requested while init_state
        # compiles (minutes) must take effect at the first epoch check.
        # Stale-flag hygiene is the launcher's job (reset_stop()).
        if self.state is None:
            self.init_state()

        # emergency checkpoint on SIGTERM/SIGINT (reference just closes the
        # TB writer and dies, train.py:231-241 — resumable only from the last
        # save epoch; we save exactly where we stopped)
        import signal

        interrupted = {"flag": False}

        def _handler(signum, frame):
            interrupted["flag"] = True
            print(f"signal {signum}: finishing epoch then checkpointing...")

        old_handlers = {}
        for sig in (signal.SIGTERM, signal.SIGINT):
            try:
                old_handlers[sig] = signal.signal(sig, _handler)
            except ValueError:
                pass  # not the main thread

        # same seed on every host: the rng is a *replicated* jit input, and
        # SPMD requires replicated inputs to be identical across processes
        # (per-example noise still differs per row — it is drawn sharded
        # inside the step). Per-host data comes from the batcher shard.
        rng = jax.random.PRNGKey(self.args.seed)
        try:
            for epoch in range(self.start_epoch, self.args.total_epochs + 1):
                if interrupted["flag"] or _STOP_EVENT.is_set():
                    self.save(epoch - 1)
                    print(f"emergency checkpoint at epoch {epoch - 1}; exiting")
                    break
                rng, erng, vrng, rrng = jax.random.split(rng, 4)
                stats = self.train_epoch(epoch, erng)
                print(
                    f"epoch {epoch}/{self.args.total_epochs} "
                    f"| {stats.get('epoch_seconds', 0):.1f}s "
                    f"| g={stats.get('avg/loss_gen_all', float('nan')):.3f} "
                    f"| d={stats.get('avg/loss_disc', float('nan')):.3f}"
                )
                self._write_heartbeat(epoch)
                if epoch % self.args.save_every_epoch == 0 or epoch == self.args.total_epochs:
                    self.validate(vrng)
                    try:
                        self.render_reference(epoch, rrng)
                    except Exception as e:
                        print(f"reference render skipped ({e})")
                    self.save(epoch)
                    self.logger.flush()
        finally:
            # restore even when train_epoch/save raises — otherwise the
            # embedding process is left with a handler that only sets a flag
            # no loop will ever read (uninterruptible process)
            for sig, h in old_handlers.items():
                signal.signal(sig, h)


def _prune_orbax_dirs(exp_dir: str, keep_epoch: int) -> None:
    """orbax writes one directory per epoch; honor save_only_latest's disk
    bound by removing every orbax_<n> with n < keep_epoch (shared-FS layout,
    so host 0 prunes for the job)."""
    import shutil

    for d in glob.glob(os.path.join(exp_dir, "orbax_*")):
        m = re.fullmatch(r"orbax_(\d+)", os.path.basename(d))
        if m and int(m.group(1)) < keep_epoch:
            shutil.rmtree(d, ignore_errors=True)


def _opt_state_arrays(opt_state) -> Dict[str, Any]:
    """Flatten an optax state into an index-keyed dict of arrays."""
    leaves = jax.tree.leaves(opt_state)
    return {f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)
            if isinstance(l, (np.ndarray, jnp.ndarray))}


def _tree_signature(tree) -> Dict[str, tuple]:
    """Key-path -> shape map, robust across dict/FrozenDict containers."""
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(k): tuple(np.shape(v)) for k, v in flat}


def _restore_opt_state(template, arrays: Dict[str, Any]):
    leaves, treedef = jax.tree.flatten(template)
    restored = []
    for i, leaf in enumerate(leaves):
        key = f"leaf_{i}"
        if key in arrays and hasattr(leaf, "shape") and arrays[key].shape == leaf.shape:
            restored.append(jnp.asarray(arrays[key]))
        else:
            restored.append(leaf)
    return jax.tree.unflatten(treedef, restored)
