"""Bag loader: the DataLoader-worker replacement for TPU input pipelines.

The reference feeds one ragged bag at a time through a multi-process torch
DataLoader (``sample_data`` from the missing PyTorchHelpers module,
reference call site: gbm/classify_combined.py:313,412; a local definition
survives at gbm/classify.py:85-98). On TPU the equivalent is:

  * pad each bag to a static bucket size (powers-of-two ladder) with a
    validity mask, so jit compiles one program per bucket instead of one
    per bag length;
  * prefetch bags on a background thread so host decode/augment overlaps
    device compute (double buffering);
  * optionally round the bucket up to a multiple of the tile-mesh axis so
    sharded bags split evenly over chips.

The model threads the mask through every tile reduction, so padded
execution is numerically identical to the ragged original.
"""

import math
import queue
import threading
import time
import warnings

import jax.numpy as jnp
import numpy as np

DEFAULT_BUCKETS = (32, 64, 128, 256, 512, 1024, 2048, 2560)


def bucket_for(n: int, buckets=DEFAULT_BUCKETS, multiple_of: int = 1) -> int:
    """Smallest bucket >= n (and a multiple of ``multiple_of``).

    Above the top bucket, sizes round up to a coarse granule —
    lcm(1024, multiple_of) — instead of the exact count: eval bags are
    uncapped (reference runs all tiles), and an exact-size pad would
    compile a fresh program per oversized slide (minutes each on TPU).
    The padding is mask-exact; the waste is bounded at granule-1 tiles
    (1023 at multiple_of=1)."""
    for b in buckets:
        if b >= n:
            # ladder bucket, rounded up to the mesh multiple when the
            # power-of-two isn't divisible (e.g. a 6-device tile axis:
            # 32 -> 36, not a jump to the 3072 granule)
            if b % multiple_of:
                b += multiple_of - b % multiple_of
            return b
    top = buckets[-1]
    if top % multiple_of:
        top += multiple_of - top % multiple_of
    granule = 1024 * multiple_of // math.gcd(1024, multiple_of)
    return max(top, ((n + granule - 1) // granule) * granule)


def epoch_loader_seed(seed: int, epoch: int) -> int:
    """Deterministic bag-order seed for epoch E — a pure function of
    (seed, E), shared by every driver so the bit-exact elastic-resume
    recipe cannot drift between them."""
    return int(np.random.SeedSequence([seed, epoch, 7])
               .generate_state(1)[0] & 0x7FFFFFFF)


def pad_bag(tiles, n_tiles: int | None = None, *, buckets=DEFAULT_BUCKETS,
            multiple_of: int = 1):
    """Pad [T, ...] to its bucket; returns (padded, mask[T_b])."""
    t = tiles.shape[0]
    target = bucket_for(t, buckets, multiple_of) if n_tiles is None else n_tiles
    if target < t:
        # fail HERE: .at[:t] would silently clamp the mask to target while
        # the tiles kept length t, and the mismatch only surfaces as a
        # confusing stack/broadcast error deep inside the jitted forward
        raise ValueError(
            f"bag of {t} tiles cannot pad to n_tiles={target}")
    mask = jnp.zeros((target,), jnp.float32).at[:t].set(1.0)
    if target > t:
        pad = [(0, target - t)] + [(0, 0)] * (tiles.ndim - 1)
        tiles = jnp.pad(tiles, pad)
    return tiles, mask


class BagPrefetcher:
    """Iterate (tiles, mask, label[, extras]) bags with background prefetch.

    dataset: anything indexable returning (tiles, label) or a longer tuple
    (interface mode). Bags are padded to buckets here, on the producer
    thread, so the consumer only sees ready-to-jit shapes.
    """

    # depth=4: measured at production shapes (512x300x300 bags, real TPU,
    # PROFILE.md "input pipeline"): depth 2 stalled the device 21.5% of
    # step time waiting for host decode+H2D; depth 4 measured 0.9%
    def __init__(self, dataset, *, shuffle: bool = False, depth: int = 4,
                 buckets=DEFAULT_BUCKETS, multiple_of: int = 1,
                 seed: int | None = None, workers: int = 1):
        """``workers`` > 1 runs N producer threads (the reference's
        DataLoader ``num_workers``, gbm/classify.py:86) — parallel disk
        reads for when host IO, not the device, bounds the pipeline.
        Delivery is then out of order, so it requires ``shuffle=True``
        (eval paths need order and keep the single in-order producer)."""
        if workers > 1 and not shuffle:
            raise ValueError("workers > 1 delivers out of order; eval "
                             "iteration needs order — use shuffle=True")
        self.dataset = dataset
        self.shuffle = shuffle
        self.depth = depth
        self.buckets = buckets
        self.multiple_of = multiple_of
        self.workers = workers
        self._rng = np.random.default_rng(seed)
        # input-pipeline stall instrumentation: `wait_s` is how long the
        # consumer (= the device's feeder) blocked on an empty queue —
        # device-idle time caused by the input pipeline; `produce_s` is
        # host decode/augment/H2D time per bag on the producer thread(s)
        self.stats = {"bags": 0, "wait_s": 0.0, "produce_s": 0.0,
                      "consume_s": 0.0}
        self._iter_t0 = None  # start of the in-progress iteration, if any
        # produce_s is incremented from N pool threads; += on a dict float
        # is a non-atomic read-modify-write, so guard it
        self._stats_lock = threading.Lock()

    def __len__(self):
        return len(self.dataset)

    def stall_fraction(self) -> float:
        """Fraction of the consumer's wall time spent waiting for bags
        (>0.1 means the input pipeline is the bottleneck — raise `depth`
        or `workers`, or move more of the transform on device). Valid
        mid-epoch too: the in-progress iteration's elapsed time counts
        toward the denominator (consume_s alone is only updated at
        iteration end, which would read 0.0 all through epoch 1 and >1.0
        when polled later)."""
        total = self.stats["consume_s"]
        t0 = self._iter_t0
        if t0 is not None:
            total += time.perf_counter() - t0
        return self.stats["wait_s"] / total if total > 0 else 0.0

    def _produce_one(self, idx: int):
        t0 = time.perf_counter()
        item = self.dataset[int(idx)]
        tiles, label = item[0], item[1]
        tiles, mask = pad_bag(jnp.asarray(tiles), buckets=self.buckets,
                              multiple_of=self.multiple_of)
        label = int(np.asarray(label).reshape(-1)[0])
        dt = time.perf_counter() - t0
        with self._stats_lock:
            self.stats["produce_s"] += dt
        return (tiles, mask, label, *item[2:])

    def __iter__(self):
        order = np.arange(len(self.dataset))
        if self.shuffle:
            self._rng.shuffle(order)

        if self.workers > 1:
            source = _parallel_items(self._produce_one, order, self.workers)
        else:
            source = (self._produce_one(idx) for idx in order)

        t_iter = time.perf_counter()
        self._iter_t0 = t_iter
        try:
            for item in prefetch_iter(source, depth=self.depth,
                                      stats=self.stats):
                self.stats["bags"] += 1
                yield item
        finally:
            self._iter_t0 = None
            self.stats["consume_s"] += time.perf_counter() - t_iter


def _parallel_items(fn, indices, workers: int):
    """Yield fn(idx) for every index, computed by a thread pool, delivered
    as they complete (out of order). Lazy: at most ``workers`` items are
    in flight, so device-resident bags don't pile up."""
    from concurrent.futures import FIRST_COMPLETED, ThreadPoolExecutor, wait

    with ThreadPoolExecutor(max_workers=workers) as pool:
        pending = set()
        it = iter(indices)
        try:
            while True:
                while len(pending) < workers:
                    try:
                        pending.add(pool.submit(fn, next(it)))
                    except StopIteration:
                        break
                if not pending:
                    return
                done, pending = wait(pending, return_when=FIRST_COMPLETED)
                for fut in done:
                    yield fut.result()
        finally:
            for fut in pending:
                fut.cancel()


def prefetch_iter(iterable, *, depth: int = 2, stats: dict | None = None):
    """Background-thread prefetch of any iterable: overlaps the producer's
    work (decode/augment/H2D) with the consumer's device steps.

    Producer exceptions re-raise in the consumer. A consumer that stops
    early (break/GC) cannot leave the producer blocked on a full queue
    holding device-resident items. ``stats['wait_s']``, when given,
    accumulates consumer block time (= device idle caused by input)."""
    q: queue.Queue = queue.Queue(maxsize=depth)
    stop = object()
    closed = threading.Event()

    def put(item) -> bool:
        while not closed.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def produce():
        try:
            for item in iterable:
                if closed.is_set() or not put(item):
                    return
        except Exception as e:  # surface producer errors to the consumer
            put(e)
        finally:
            # an early consumer exit abandons the source mid-iteration;
            # close it HERE (on the producer thread the consumer joins)
            # so a _parallel_items source shuts down its thread pool —
            # pool.shutdown(wait=True) in its `with` — before control
            # returns. Without this, up to `workers` pool threads keep
            # reading the dataset (rng state, device allocations) after
            # the join, re-enabling the race the join exists to prevent.
            close = getattr(iterable, "close", None)
            if close is not None:
                close()
        put(stop)

    worker = threading.Thread(target=produce, daemon=True)
    worker.start()
    try:
        while True:
            t0 = time.perf_counter()
            item = q.get()
            if stats is not None:
                stats["wait_s"] += time.perf_counter() - t0
            if item is stop:
                return
            if isinstance(item, Exception):
                raise item
            yield item
    finally:
        closed.set()
        # drain + JOIN: an in-flight producer item may still be reading
        # shared state (e.g. a dataset rng the caller reseeds right after
        # an early break — the bit-exact-resume recipe); returning before
        # the thread finishes would let it race the next epoch's stream
        while True:
            try:
                q.get_nowait()
            except queue.Empty:
                break
        # the join must not time out SILENTLY: a producer stuck past the
        # window (mid-epoch cache build, multi-GB eval transform) would
        # otherwise keep reading the dataset rng after control returns,
        # re-enabling the reseed race the join exists to prevent. Loop
        # joining while the thread lives (draining anything it enqueues so
        # it can't deadlock on a full queue), warning so a determinism
        # guarantee that is being stretched fails loudly.
        deadline = time.monotonic() + 30.0
        worker.join(timeout=30.0)
        while worker.is_alive():
            warnings.warn(
                "prefetch_iter: producer still running "
                f"{time.monotonic() - deadline + 30.0:.0f}s after consumer "
                "close; blocking until it finishes to preserve bit-exact "
                "resume (a reseed during this window would race the "
                "producer's rng reads)", RuntimeWarning, stacklevel=2)
            while True:
                try:
                    q.get_nowait()
                except queue.Empty:
                    break
            worker.join(timeout=30.0)


def sample_data(dataset, *, image_size: int | None = None,
                shuffle: bool = True, **kwargs):
    """PyTorchHelpers.sample_data equivalent (call sites:
    gbm/classify_combined.py:313,412): arm the dataset's transforms at
    ``image_size`` and return a prefetching bag iterator."""
    if image_size is not None:
        dataset.NewResolution(image_size)
    return BagPrefetcher(dataset, shuffle=shuffle, **kwargs)
