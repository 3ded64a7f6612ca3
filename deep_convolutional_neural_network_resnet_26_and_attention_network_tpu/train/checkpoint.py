"""Checkpoint save/load with the reference's filename and restore modes.

The reference saves ``{'classifier': state_dict, 'optimizer': state_dict}``
to ``<output_dir>/train_step-<epoch:03d>.model`` after every epoch
(reference: gbm/classify_combined.py:468-474) and restores either the full
model with ``strict=False`` (:521-524) or, in ``--transfer`` mode, only the
ResNet conv weights — keys containing both 'cnn' and 'conv' — leaving every
linear layer freshly initialized (:526-535, gbm/model.py:183-187).

Here a checkpoint is one ``.model`` file holding an npz of the flattened
parameter/optimizer pytrees ('/'-joined path keys), which makes the
transfer-mode key filter a literal string match like the original.
"""

import io
import os
import re
import threading

import jax
import jax.numpy as jnp
import numpy as np


def _flatten(tree, prefix=""):
    flat = {}
    if tree is None:
        # jax.tree_util.tree_flatten skips None nodes (optax.masked etc.);
        # emitting a key here would shift the key<->leaf zip in the
        # restore paths by one and silently corrupt every later slot
        return flat
    if isinstance(tree, dict):
        # sorted keys: matches jax.tree_util's dict traversal order, so the
        # flat key list can be zipped against tree_flatten leaves
        for k in sorted(tree.keys()):
            flat.update(_flatten(tree[k], f"{prefix}{k}/"))
    elif isinstance(tree, (list, tuple)) and not hasattr(tree, "_fields"):
        for i, v in enumerate(tree):
            flat.update(_flatten(v, f"{prefix}{i}/"))
    elif hasattr(tree, "_fields"):  # NamedTuple (optax states, TrainState)
        for k in tree._fields:
            flat.update(_flatten(getattr(tree, k), f"{prefix}{k}/"))
    else:
        flat[prefix[:-1]] = np.asarray(tree)
    return flat


def checkpoint_path(output_dir: str, epoch: int, final: bool = False) -> str:
    suffix = "_FINAL" if final else ""
    return os.path.join(output_dir, f"train_step-{epoch:03d}{suffix}.model")


def save_blob(path: str, blob: dict):
    """Atomically persist an already-flattened checkpoint blob."""
    buf = io.BytesIO()
    np.savez(buf, **blob)
    # tmp + os.replace: a kill mid-write must never leave a truncated
    # checkpoint where latest_checkpoint()/--ckpt auto would pick it up
    tmp = f"{path}.{os.getpid()}.tmp"
    try:
        with open(tmp, "wb") as f:
            f.write(buf.getvalue())
        os.replace(tmp, path)
    except OSError:
        if os.path.isfile(tmp):
            os.unlink(tmp)
        raise
    return path


def save(path: str, params, opt_state=None, extra: dict | None = None):
    """Persist params (+ optimizer state) as one .model file."""
    blob = {f"classifier/{k}": v for k, v in _flatten(params).items()}
    if opt_state is not None:
        blob.update({f"optimizer/{k}": v
                     for k, v in _flatten(opt_state).items()})
    for k, v in (extra or {}).items():
        blob[f"extra/{k}"] = np.asarray(v)
    return save_blob(path, blob)


def load_raw(path: str) -> dict:
    with np.load(path, allow_pickle=False) as z:
        return {k: z[k] for k in z.files}


def restore_params(params, path: str, *, transfer: bool = False,
                   strict: bool = False):
    """Overlay checkpointed leaves onto a freshly initialized pytree.

    strict=False skips missing keys and shape mismatches (torch
    ``load_state_dict(strict=False)`` semantics). transfer=True keeps only
    keys containing both 'cnn' and 'conv' — exactly the reference's
    ResNet-conv-only transfer filter.
    """
    blob = load_raw(path)
    flat_new = _flatten(params)
    loaded, skipped, vals = [], [], {}
    for key, value in blob.items():
        if not key.startswith("classifier/"):
            continue
        pkey = key[len("classifier/"):]
        if transfer and not ("cnn" in pkey and "conv" in pkey):
            continue
        if pkey not in flat_new:
            if strict:
                raise KeyError(f"unexpected checkpoint key {pkey}")
            skipped.append(pkey)
            continue
        if flat_new[pkey].shape != value.shape:
            if strict:
                raise ValueError(f"shape mismatch at {pkey}")
            skipped.append(pkey)
            continue
        vals[pkey] = jnp.asarray(value)
        loaded.append(pkey)
    if strict:
        missing = set(flat_new) - set(loaded)
        if missing and not transfer:
            raise KeyError(f"missing checkpoint keys: {sorted(missing)[:5]}...")
    # rebuild via flatten/unflatten (not leaf mutation): works for ANY
    # pytree — tuples included — because _flatten's key order mirrors
    # tree_flatten's traversal
    flat_order = list(flat_new.keys())
    leaves, treedef = jax.tree_util.tree_flatten(params)
    new_leaves = [vals.get(k, leaf) for k, leaf in zip(flat_order, leaves)]
    out = jax.tree_util.tree_unflatten(treedef, new_leaves)
    return out, loaded, skipped


def restore_opt_state(opt_state, path: str):
    """Restore optimizer state leaf-for-leaf (shapes must match)."""
    blob = load_raw(path)
    flat = _flatten(opt_state)
    vals = {}
    for key, value in blob.items():
        if key.startswith("optimizer/"):
            okey = key[len("optimizer/"):]
            if okey in flat and flat[okey].shape == value.shape:
                vals[okey] = jnp.asarray(value)
    if not vals:
        return opt_state, False

    # _flatten traverses dicts in sorted-key order, same as tree_flatten,
    # so the flat key list zips 1:1 against the flattened leaves.
    flat_order = list(flat.keys())
    leaves, treedef = jax.tree_util.tree_flatten(opt_state)
    new_leaves = [vals.get(k, leaf) for k, leaf in zip(flat_order, leaves)]
    return jax.tree_util.tree_unflatten(treedef, new_leaves), True


class AsyncCheckpointer:
    """Overlap the checkpoint's D2H fetch + serialization + file write with
    training (the idiom orbax calls async checkpointing).

    ``save()``/``submit()`` capture pytree *references* and return
    immediately; a worker thread does the ``np.asarray`` device fetches,
    flattening, and the atomic tmp+rename write. This is safe because JAX
    arrays are immutable and no trainer here donates parameter buffers —
    the next step builds NEW arrays, it never mutates the snapshot. At most
    one write is in flight: a new submit (or ``wait()``) joins the previous
    one first, and a worker failure re-raises there instead of vanishing.
    Callers MUST ``wait()`` before process exit / halt paths so the final
    epoch's file is durable (the thread is non-daemon, so a clean
    interpreter exit also drains it).
    """

    def __init__(self):
        self._thread: threading.Thread | None = None
        self._exc: BaseException | None = None

    def submit(self, fn, /, *args, **kwargs):
        self.wait()

        def run():
            try:
                fn(*args, **kwargs)
            except BaseException as e:  # surfaced by the next wait()
                self._exc = e

        self._thread = threading.Thread(
            target=run, name="async-checkpoint-writer")
        self._thread.start()

    def save(self, path: str, params, opt_state=None,
             extra: dict | None = None):
        """Async counterpart of module-level ``save``."""
        self.submit(save, path, params, opt_state, extra)

    def wait(self):
        """Join the in-flight write (if any); re-raise its failure."""
        t, self._thread = self._thread, None
        if t is not None:
            t.join()
        if self._exc is not None:
            e, self._exc = self._exc, None
            raise e


def latest_checkpoint(output_dir: str) -> str | None:
    pattern = re.compile(r"train_step-(\d+)(_FINAL)?\.model$")
    best, best_epoch = None, -1
    for name in os.listdir(output_dir):
        m = pattern.match(name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(output_dir, name)
    return best
