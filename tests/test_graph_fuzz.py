"""Differential fuzz of the live graph layer (SpaceVideoManager).

The graph layer's contract (reference graph/video.py:42-78,231-293):
a SpaceVideoManager tracks the model *live* — after any sequence of
edits its output must equal a manager compiled fresh from the current
model state, and every frame whose pixels changed must fall inside the
union of fired ``frames_updated`` dirty ranges (an under-reported range
leaves stale frames in caches/displays downstream).

Random edit scripts check both properties after every step, the same
differential scheme test_render_fuzz.py uses for the batched planner.
"""

import os
import random

import pytest

from canvas_tpu import process
from canvas_tpu.basetypes import box2i
from canvas_tpu.editor import model, plugins
from canvas_tpu.editor.graph.video import SpaceVideoManager

_SEEDS = int(os.environ.get('CANVAS_FUZZ_SEEDS', '0'))

HORIZON = 100
VIDFORMAT = plugins.VideoFormat()


def make_asset_list():
    slist = model.AssetList()
    for name, color in (('red', (100, 0, 0)), ('green', (0, 100, 0)),
                        ('blue', (0, 0, 100)), ('gray', (50, 50, 50))):
        source = process.SolidColorVideoSource(
            process.LerpFunc((0, 0, 0, 1),
                             (color[0], color[1], color[2], 1), 100))
        slist[name] = model.RuntimeSourceAsset(model.RuntimeSource(
            name, {'video': plugins.VideoStream(source)}))
    return slist


class DirtyUnion:
    """Accumulates frames_updated ranges as a set of dirty frames."""

    def __init__(self, stream):
        stream.frames_updated.connect(self._update)
        self.frames = set()

    def _update(self, *args):
        lo, hi = args[-2], args[-1]
        lo = 0 if lo is None else int(lo)           # None = unbounded
        hi = HORIZON - 1 if hi is None else int(hi)
        self.frames.update(range(max(0, lo), min(HORIZON, hi + 1)))

    def reset(self):
        self.frames = set()


def snapshot(source):
    """Pixel (0,0) color per frame over the horizon (solid sources fill
    the probe window, so one pixel identifies the composite)."""
    out = []
    for f in range(HORIZON):
        frame = source.get_frame_f32(f, box2i(0, 0, 0, 0))
        px = frame.pixel(0, 0)
        out.append(None if px is None else (round(px.r, 5), round(px.g, 5),
                                            round(px.b, 5), round(px.a, 5)))
    return out


def random_clip(rng, names):
    return model.Clip(type='video',
                      x=rng.randrange(0, 70),
                      y=rng.uniform(0.0, 3.0),
                      length=rng.randrange(1, 30),
                      height=1.0,
                      offset=rng.randrange(0, 6),
                      source=model.AssetStreamRef(rng.choice(names), 'video'))


def random_seq_item(rng, names, first=False):
    return model.SequenceItem(
        source=model.AssetStreamRef(rng.choice(names), 'video'),
        offset=rng.randrange(0, 6),
        length=rng.randrange(2, 12),
        transition_length=0 if first else rng.randrange(0, 2))


def legal_transition_length(rng, seq, index, length=None):
    """A transition_length that keeps every visible length positive:
    bounded by this item's length and the previous item's visible
    length (the model is loose here; manipulators enforce this)."""
    if index == 0:
        return 0
    length = seq[index].length if length is None else length
    prev = seq[index - 1]
    bound = min(prev.length - prev.transition_length - 1, length - 1)
    if bound < 1:
        return 0
    return rng.randrange(0, bound + 1)


def clamp_following_transition(seq, index):
    """After editing item *index*, the NEXT item's transition may
    exceed the new visible length — clamp it back to legal."""
    if index + 1 >= len(seq):
        return
    item, nxt = seq[index], seq[index + 1]
    bound = max(0, min(item.length - item.transition_length - 1,
                       nxt.length - 1))
    if nxt.transition_length > bound:
        nxt.update(transition_length=bound)


def run_graph_fuzz(seed, n_ops=30):
    rng = random.Random(seed)
    names = ['red', 'green', 'blue', 'gray']
    slist = make_asset_list()
    space = model.Space('fuzz', VIDFORMAT, plugins.AudioFormat())

    items = [random_clip(rng, names) for _ in range(3)]
    seq = model.Sequence(type='video', x=rng.randrange(0, 40),
                         y=rng.uniform(0.0, 3.0), height=1.0,
                         items=[random_seq_item(rng, names, first=True),
                                random_seq_item(rng, names),
                                random_seq_item(rng, names)])
    items.append(seq)
    space[0:0] = items

    live = SpaceVideoManager(space, slist)
    assert not live.alerts, str(live.alerts[:1])
    dirty = DirtyUnion(live)
    baseline = snapshot(SpaceVideoManager(space, slist))
    assert snapshot(live) == baseline

    for step in range(n_ops):
        dirty.reset()
        clips = [it for it in space if not isinstance(it, model.Sequence)]
        seqs = [it for it in space if isinstance(it, model.Sequence)]
        ops = ['move', 'resize', 'restack']
        if clips:
            ops.append('swap_source')
        if len(space) < 7:
            ops.append('add')
        if len(space) > 2 and clips:
            ops.append('remove')
        if seqs:
            ops += ['seq_update', 'seq_insert']
            if any(len(s) > 1 for s in seqs):
                ops.append('seq_remove')
        op = rng.choice(ops)

        if op == 'move':
            rng.choice(list(space)).update(x=rng.randrange(0, 70),
                                           y=rng.uniform(0.0, 3.0))
        elif op == 'swap_source':
            rng.choice(clips).update(
                source=model.AssetStreamRef(rng.choice(names), 'video'))
        elif op == 'resize':
            target = rng.choice(clips) if clips else rng.choice(list(space))
            if isinstance(target, model.Sequence):
                target.update(x=rng.randrange(0, 70))
            else:
                target.update(length=rng.randrange(1, 30),
                              offset=rng.randrange(0, 6))
        elif op == 'restack':
            # y drives the z sort among overlapping items
            rng.choice(list(space)).update(y=rng.uniform(0.0, 3.0))
        elif op == 'add':
            k = rng.randrange(0, len(space) + 1)
            space[k:k] = [random_clip(rng, names)]
        elif op == 'remove':
            del space[space.index(rng.choice(clips))]
        elif op == 'seq_update':
            s = rng.choice(seqs)
            i = rng.randrange(len(s))
            length = rng.randrange(2, 12)
            s[i].update(offset=rng.randrange(0, 6), length=length,
                        transition_length=legal_transition_length(
                            rng, s, i, length=length))
            clamp_following_transition(s, i)
        elif op == 'seq_insert':
            s = rng.choice(seqs)
            k = rng.randrange(0, len(s) + 1)
            s[k:k] = [random_seq_item(rng, names, first=(k == 0))]
            clamp_following_transition(s, k)
        elif op == 'seq_remove':
            s = rng.choice([s for s in seqs if len(s) > 1])
            k = rng.randrange(len(s))
            del s[k]
            if len(s) and s[0].transition_length:
                s[0].update(transition_length=0)
            if k > 0 and k < len(s):
                clamp_following_transition(s, k - 1)

        fresh = snapshot(SpaceVideoManager(space, slist))
        live_colors = snapshot(live)
        assert live_colors == fresh, (
            'seed %d step %d op %s: live manager diverged from fresh '
            'compile at frames %s' % (
                seed, step, op,
                [f for f in range(HORIZON)
                 if live_colors[f] != fresh[f]][:10]))

        changed = {f for f in range(HORIZON) if fresh[f] != baseline[f]}
        missed = changed - dirty.frames
        assert not missed, (
            'seed %d step %d op %s: frames %s changed but were not in '
            'any fired frames_updated range' % (
                seed, step, op, sorted(missed)[:10]))
        baseline = fresh


@pytest.mark.parametrize('seed', range(max(4, _SEEDS)))
def test_space_graph_differential_fuzz(seed):
    run_graph_fuzz(seed)


def run_nested_graph_fuzz(seed, n_ops=20):
    """Differential fuzz with a nested composition in the mix: outer
    clips reference a SpaceAsset's 'Video' stream, and edits hit BOTH
    levels — inner edits must propagate through the connector chain as
    correctly rebased dirty ranges."""
    rng = random.Random(4000 + seed)
    names = ['red', 'green', 'blue', 'gray']
    slist = make_asset_list()

    inner = model.Space('inner', VIDFORMAT, plugins.AudioFormat())
    inner[0:0] = [random_clip(rng, names) for _ in range(2)]
    slist['comp'] = model.SpaceAsset(inner, name='comp')

    outer = model.Space('outer', VIDFORMAT, plugins.AudioFormat())
    outer[0:0] = [random_clip(rng, names),
                  model.Clip(type='video', x=rng.randrange(0, 40),
                             y=rng.uniform(0.0, 3.0),
                             length=rng.randrange(10, 40), height=1.0,
                             offset=rng.randrange(0, 10),
                             source=model.AssetStreamRef('comp', 'Video'))]

    live = SpaceVideoManager(outer, slist)
    assert not live.alerts, str(live.alerts[:1])
    dirty = DirtyUnion(live)
    baseline = snapshot(SpaceVideoManager(outer, slist))
    assert snapshot(live) == baseline

    for step in range(n_ops):
        dirty.reset()
        op = rng.choice(['outer_move', 'outer_resize', 'inner_move',
                         'inner_resize', 'inner_restack', 'inner_add',
                         'inner_remove'])
        if op == 'outer_move':
            rng.choice(list(outer)).update(x=rng.randrange(0, 70),
                                           y=rng.uniform(0.0, 3.0))
        elif op == 'outer_resize':
            rng.choice(list(outer)).update(length=rng.randrange(5, 40),
                                           offset=rng.randrange(0, 10))
        elif op == 'inner_move':
            rng.choice(list(inner)).update(x=rng.randrange(0, 70),
                                           y=rng.uniform(0.0, 3.0))
        elif op == 'inner_resize':
            rng.choice(list(inner)).update(length=rng.randrange(1, 30),
                                           offset=rng.randrange(0, 6))
        elif op == 'inner_restack':
            rng.choice(list(inner)).update(y=rng.uniform(0.0, 3.0))
        elif op == 'inner_add' and len(inner) < 5:
            inner[0:0] = [random_clip(rng, names)]
        elif op == 'inner_remove' and len(inner) > 1:
            del inner[rng.randrange(len(inner))]

        fresh = snapshot(SpaceVideoManager(outer, slist))
        live_colors = snapshot(live)
        assert live_colors == fresh, (
            'seed %d step %d op %s diverged at %s' % (
                seed, step, op,
                [f for f in range(HORIZON)
                 if live_colors[f] != fresh[f]][:10]))
        changed = {f for f in range(HORIZON) if fresh[f] != baseline[f]}
        missed = changed - dirty.frames
        assert not missed, (
            'seed %d step %d op %s: frames %s changed but were not in '
            'any fired frames_updated range' % (
                seed, step, op, sorted(missed)[:10]))
        baseline = fresh


@pytest.mark.parametrize('seed', range(max(3, _SEEDS // 4)))
def test_nested_graph_differential_fuzz(seed):
    run_nested_graph_fuzz(seed)


# --- audio graph ------------------------------------------------------------

AUDIO_HORIZON = 2000
AUDIO_EPS = 1e-2


class RampAudio:
    """Sample value == (source sample index mod 509) times a small
    integer scale: offsets are visible and magnitudes stay bounded
    (~3.5k), so float32 addition-order noise between live and fresh
    composites (their workspaces sum equal-z items in insertion order)
    stays orders of magnitude below AUDIO_EPS while real edits move
    samples by >= 1."""

    def __init__(self, scale):
        self.scale = scale

    def _render(self, frame):
        import numpy as np
        lo, hi = frame.full_min_sample, frame.full_max_sample
        ramp = (np.arange(lo, hi + 1, dtype=np.int64) % 509).astype(
            np.float32) * float(self.scale)
        frame.data = np.repeat(ramp[:, None], frame.channels, axis=1)
        frame.current_min_sample = lo
        frame.current_max_sample = hi


def make_audio_asset_list():
    from canvas_tpu.audio import AudioSource

    class _Src(RampAudio, AudioSource):
        pass

    slist = model.AssetList()
    for name, scale in (('a', 1), ('b', 5), ('c', 7)):
        slist[name] = model.RuntimeSourceAsset(model.RuntimeSource(
            name, {'audio': plugins.AudioStream(_Src(scale))}))
    return slist


def audio_snapshot(source):
    import numpy as np
    frame = source.get_frame(0, AUDIO_HORIZON - 1, 1)
    data = np.zeros(AUDIO_HORIZON, np.float32)
    if frame.current_min_sample <= frame.current_max_sample:
        lo = frame.current_min_sample - frame.full_min_sample
        hi = frame.current_max_sample - frame.full_min_sample
        data[frame.current_min_sample:frame.current_max_sample + 1] = (
            np.asarray(frame.data)[lo:hi + 1, 0])
    return data.tolist()


def random_audio_clip(rng, names):
    return model.Clip(type='audio',
                      x=rng.randrange(0, 1500),
                      y=rng.uniform(0.0, 3.0),
                      length=rng.randrange(1, 400),
                      height=1.0,
                      offset=rng.randrange(0, 50),
                      source=model.AssetStreamRef(rng.choice(names), 'audio'))


def random_audio_seq_item(rng, names, first=False):
    return model.SequenceItem(
        source=model.AssetStreamRef(rng.choice(names), 'audio'),
        offset=rng.randrange(0, 50),
        length=rng.randrange(20, 300),
        transition_length=0 if first else rng.randrange(0, 10))


def run_audio_graph_fuzz(seed, n_ops=25):
    from canvas_tpu.editor.graph.audio import SpaceAudioManager

    rng = random.Random(seed)
    names = ['a', 'b', 'c']
    slist = make_audio_asset_list()
    space = model.Space('afuzz', VIDFORMAT,
                        plugins.AudioFormat(sample_rate=48000))

    items = [random_audio_clip(rng, names) for _ in range(3)]
    seq = model.Sequence(type='audio', x=rng.randrange(0, 800),
                         y=rng.uniform(0.0, 3.0), height=1.0,
                         items=[random_audio_seq_item(rng, names, first=True),
                                random_audio_seq_item(rng, names)])
    items.append(seq)
    space[0:0] = items

    live = SpaceAudioManager(space, slist)
    assert not live.alerts, str(live.alerts[:1])

    dirty = DirtyUnionSamples(live)
    baseline = audio_snapshot(SpaceAudioManager(space, slist))
    assert audio_snapshot(live) == baseline

    for step in range(n_ops):
        dirty.reset()
        clips = [it for it in space if not isinstance(it, model.Sequence)]
        seqs = [it for it in space if isinstance(it, model.Sequence)]
        ops = ['move', 'resize']
        if clips:
            ops.append('swap_source')
        if len(space) < 6:
            ops.append('add')
        if len(space) > 2 and clips:
            ops.append('remove')
        if seqs:
            ops += ['seq_update', 'seq_insert']
            if any(len(s) > 1 for s in seqs):
                ops.append('seq_remove')
        op = rng.choice(ops)

        if op == 'move':
            rng.choice(list(space)).update(x=rng.randrange(0, 1500),
                                           y=rng.uniform(0.0, 3.0))
        elif op == 'swap_source':
            rng.choice(clips).update(
                source=model.AssetStreamRef(rng.choice(names), 'audio'))
        elif op == 'resize':
            target = rng.choice(clips) if clips else rng.choice(list(space))
            if isinstance(target, model.Sequence):
                target.update(x=rng.randrange(0, 800))
            else:
                target.update(length=rng.randrange(1, 400),
                              offset=rng.randrange(0, 50))
        elif op == 'add':
            k = rng.randrange(0, len(space) + 1)
            space[k:k] = [random_audio_clip(rng, names)]
        elif op == 'remove':
            del space[space.index(rng.choice(clips))]
        elif op == 'seq_update':
            s = rng.choice(seqs)
            i = rng.randrange(len(s))
            length = rng.randrange(20, 300)
            s[i].update(offset=rng.randrange(0, 50), length=length,
                        transition_length=legal_transition_length(
                            rng, s, i, length=length))
            clamp_following_transition(s, i)
        elif op == 'seq_insert':
            s = rng.choice(seqs)
            k = rng.randrange(0, len(s) + 1)
            s[k:k] = [random_audio_seq_item(rng, names, first=(k == 0))]
            clamp_following_transition(s, k)
        elif op == 'seq_remove':
            s = rng.choice([s for s in seqs if len(s) > 1])
            k = rng.randrange(len(s))
            del s[k]
            if len(s) and s[0].transition_length:
                s[0].update(transition_length=0)
            if k > 0 and k < len(s):
                clamp_following_transition(s, k - 1)

        fresh = audio_snapshot(SpaceAudioManager(space, slist))
        live_samples = audio_snapshot(live)
        # tolerance, not equality: crossfade envelopes make transition
        # samples non-integer, and the two workspaces sum equal-z items
        # in different insertion orders (float32 ulp at these bounded
        # magnitudes is ~1e-4; real edits move samples by >= ~1)
        diverged = [i for i in range(AUDIO_HORIZON)
                    if abs(live_samples[i] - fresh[i]) > AUDIO_EPS]
        assert not diverged, (
            'seed %d step %d op %s: live audio manager diverged at '
            'samples %s' % (seed, step, op, diverged[:10]))

        changed = {i for i in range(AUDIO_HORIZON)
                   if abs(fresh[i] - baseline[i]) > AUDIO_EPS}
        missed = changed - dirty.frames
        assert not missed, (
            'seed %d step %d op %s: samples %s changed but were not in '
            'any fired frames_updated range' % (
                seed, step, op, sorted(missed)[:10]))
        baseline = fresh


class DirtyUnionSamples(DirtyUnion):
    def _update(self, *args):
        lo, hi = args[-2], args[-1]
        lo = 0 if lo is None else int(lo)
        hi = AUDIO_HORIZON - 1 if hi is None else int(hi)
        self.frames.update(range(max(0, lo), min(AUDIO_HORIZON, hi + 1)))


@pytest.mark.parametrize('seed', range(max(4, _SEEDS)))
def test_space_audio_graph_differential_fuzz(seed):
    run_audio_graph_fuzz(seed)


# --- editor session end-to-end: model edits -> graph -> planner caches ------

def test_av_transition_curves_align():
    """The audio crossfade envelope follows the same linear law as the
    video sequence's mix curve: at every frame boundary inside a
    transition, the audio gain at that frame's first sample equals the
    video mix value (samples interpolate linearly in between)."""
    import numpy as np

    from canvas_tpu.audio import AudioSource
    from canvas_tpu.editor.graph.audio import SequenceAudioManager
    from canvas_tpu.editor.graph.video import SequenceVideoManager

    SPF = 100      # samples per frame in this synthetic setup
    TL = 4         # transition length in frames

    slist = make_asset_list()   # 'red' ramps r = frame index

    class Const(AudioSource):
        def __init__(self, v):
            self.v = v

        def _render(self, frame):
            n = frame.full_max_sample - frame.full_min_sample + 1
            frame.data = np.full((n, frame.channels), self.v, np.float32)
            frame.current_min_sample = frame.full_min_sample
            frame.current_max_sample = frame.full_max_sample

    slist['zero'] = model.RuntimeSourceAsset(model.RuntimeSource(
        'zero', {'audio': plugins.AudioStream(Const(0.0))}))
    slist['one'] = model.RuntimeSourceAsset(model.RuntimeSource(
        'one', {'audio': plugins.AudioStream(Const(1.0))}))

    # video: solid 'red' ramp crossing into solid 'green'
    vseq = model.Sequence(type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef('red', 'video'),
                           offset=0, length=10),
        model.SequenceItem(source=model.AssetStreamRef('green', 'video'),
                           offset=0, length=10, transition_length=TL)])
    vmgr = SequenceVideoManager(vseq, slist, VIDFORMAT)

    # audio: silence crossing into full-scale, same geometry in samples
    aseq = model.Sequence(type='audio', items=[
        model.SequenceItem(source=model.AssetStreamRef('zero', 'audio'),
                           offset=0, length=10 * SPF),
        model.SequenceItem(source=model.AssetStreamRef('one', 'audio'),
                           offset=0, length=10 * SPF,
                           transition_length=TL * SPF)])
    amgr = SequenceAudioManager(aseq, slist,
                                plugins.AudioFormat(sample_rate=48000))
    samples = np.asarray(amgr.get_frame(0, 16 * SPF - 1, 1).data)[:, 0]

    overlap_start = 10 - TL
    for k in range(1, TL):
        f = overlap_start + k
        px = vmgr.get_frame_f32(f, box2i(0, 0, 0, 0)).pixel(0, 0)
        # incoming 'green' ramps to value k at overlap step k, so its
        # rendered green channel / k is the video mix curve's weight
        video_mix = float(px.g) / k
        audio_gain = float(samples[f * SPF])
        assert audio_gain == pytest.approx(video_mix, abs=1e-5), (k,)
    assert samples[overlap_start * SPF] == pytest.approx(0.0)  # k=0
    # past the transition the incoming clip is at full level
    assert samples[10 * SPF + 5] == pytest.approx(1.0)


def test_removed_sequence_manager_detaches():
    """Removing a Sequence from a Space must detach the nested
    SequenceVideoManager from the model's signals — an undo that
    re-inserts the same Sequence object would otherwise be processed by
    every dead manager too (review finding)."""
    slist = make_asset_list()
    space = model.Space('det', VIDFORMAT, plugins.AudioFormat())
    seq = model.Sequence(type='video', x=0, y=0.0, height=1.0, items=[
        model.SequenceItem(source=model.AssetStreamRef('red', 'video'),
                           offset=0, length=10)])
    space[0:0] = [seq]
    live = SpaceVideoManager(space, slist)

    fired = []
    live.frames_updated.connect(lambda *a: fired.append(a[-2:]))
    del space[0]
    fired.clear()
    # The dead watcher must not react to further sequence edits...
    seq[0].update(length=20)
    assert fired == []
    # ...and re-adding (the undo path) processes edits exactly once.
    space[0:0] = [seq]
    fired.clear()
    seq[0].update(length=5)
    before = len(fired)
    assert before > 0
    seq[0].update(length=7)
    assert 0 < len(fired) - before <= 2 * before


def test_workspace_rejects_mixed_z_kinds():
    """Ints and composite tuple z-keys cannot mix in one workspace —
    rejected at the mutation site, not at render time, and a rejected
    update leaves the item fully untouched (atomicity contract)."""
    from canvas_tpu import process
    ws = process.VideoWorkspace()
    ws.add(x=0, length=10, z=(-1.0, 0))
    with pytest.raises(TypeError):
        ws.add(x=0, length=10, z=3)
    item = ws.add(x=0, length=10, z=(-2.0, -1))
    with pytest.raises(TypeError):
        item.update(x=50, z=0)
    assert item.x == 0 and item.z == (-2.0, -1)
    item.update(z=(-3.0, -2))


def test_nested_composition_renders_and_invalidates():
    """A Space used as a clip source inside another Space (the
    reference's 'spaces can act as sources' axiom): the inner
    composition renders through the outer graph AND through the batched
    planner, and an edit INSIDE the inner space propagates out as a
    correctly rebased frames_updated range that refreshes the outer
    planner's caches."""
    import numpy as np

    from canvas_tpu import render

    slist = make_asset_list()

    inner = model.Space('inner', VIDFORMAT, plugins.AudioFormat())
    inner_clip = model.Clip(type='video', x=0, y=0.0, length=30, height=1.0,
                            offset=0,
                            source=model.AssetStreamRef('red', 'video'))
    inner[0:0] = [inner_clip]
    slist['comp'] = model.SpaceAsset(inner, name='comp')

    outer = model.Space('outer', VIDFORMAT, plugins.AudioFormat())
    outer[0:0] = [model.Clip(type='video', x=10, y=0.0, length=20,
                             height=1.0, offset=0,
                             source=model.AssetStreamRef('comp', 'Video'))]
    mgr = SpaceVideoManager(outer, slist)
    assert not mgr.alerts, str(mgr.alerts[:1])

    # outer frame 15 -> inner frame 5 -> 'red' ramp value 5
    win = box2i(0, 0, 31, 23)
    px = mgr.get_frame_f32(15, win).pixel(0, 0)
    assert px is not None and px.r == pytest.approx(5.0, abs=1e-4)

    planner = render.RenderPlanner(mgr, win)
    out = np.asarray(planner.render(15, 16))
    assert float(out[0, 0, 0, 0]) == pytest.approx(5.0, abs=1e-3)

    # Edit INSIDE the inner composition: the outer signal fires with
    # the rebased range and the outer planner's caches refresh.
    fired = []
    mgr.frames_updated.connect(lambda *a: fired.append(a[-2:]))
    inner_clip.update(offset=7)      # inner frame 5 now shows ramp 12
    assert fired and any(lo <= 15 <= hi for (lo, hi) in fired), fired
    px = mgr.get_frame_f32(15, win).pixel(0, 0)
    assert px.r == pytest.approx(12.0, abs=1e-4)
    out = np.asarray(planner.render(15, 16))
    assert float(out[0, 0, 0, 0]) == pytest.approx(12.0, abs=1e-3)
    planner.close()


def test_nested_composition_audio():
    """The audio side of spaces-as-sources: an outer audio clip
    referencing a SpaceAsset's 'Audio' stream mixes the inner space's
    audio, and inner edits propagate as rebased dirty ranges."""
    import numpy as np

    from canvas_tpu.editor.graph.audio import SpaceAudioManager

    slist = make_audio_asset_list()   # ramp sources a/b/c
    inner = model.Space('inner', VIDFORMAT,
                        plugins.AudioFormat(sample_rate=48000))
    inner_clip = model.Clip(type='audio', x=0, y=0.0, length=400,
                            height=1.0, offset=100,
                            source=model.AssetStreamRef('a', 'audio'))
    inner[0:0] = [inner_clip]
    slist['comp'] = model.SpaceAsset(inner, name='comp')

    outer = model.Space('outer', VIDFORMAT,
                        plugins.AudioFormat(sample_rate=48000))
    outer[0:0] = [model.Clip(type='audio', x=50, y=0.0, length=300,
                             height=1.0, offset=0,
                             source=model.AssetStreamRef('comp', 'Audio'))]
    mgr = SpaceAudioManager(outer, slist)
    assert not mgr.alerts, str(mgr.alerts[:1])

    # outer sample 150 -> inner sample 100 -> source sample 200 -> 200%509
    data = np.asarray(mgr.get_frame(150, 150, 1).data)
    assert data[0, 0] == pytest.approx((100 + 100) % 509)

    fired = []
    mgr.frames_updated.connect(lambda *a: fired.append(a[-2:]))
    inner_clip.update(offset=150)
    assert fired and any(lo <= 150 <= hi for (lo, hi) in fired), fired
    data = np.asarray(mgr.get_frame(150, 150, 1).data)
    assert data[0, 0] == pytest.approx((100 + 150) % 509)


def test_space_source_offline_cycle_detaches_managers():
    """A Space source taken offline must stop its graph managers from
    processing model edits; offline/online cycles must not multiply
    live managers (review finding)."""
    slist = make_asset_list()
    space = model.Space('cyc', VIDFORMAT, plugins.AudioFormat())
    space[0:0] = [random_clip(random.Random(1), ['red'])]

    asset = model.SpaceAsset(space, name='cyc')
    slist['cyc'] = asset          # wires the asset's asset_list
    source = asset.get_source()
    source.bring_online()
    assert not source.offline
    video = source.get_stream('Video')

    for _ in range(3):
        source.take_offline()
        source.bring_online()
    video2 = source.get_stream('Video')

    fired = []
    video2.frames_updated.connect(lambda *a: fired.append(a[-2:]))
    space[0].update(x=space[0].x + 1)
    once = len(fired)
    assert once > 0
    space[0].update(x=space[0].x + 1)
    assert len(fired) - once == once    # exactly one live manager

    # the pre-cycle manager is dead: editing fires nothing through it
    dead = []
    video.frames_updated.connect(lambda *a: dead.append(a[-2:]))
    space[0].update(x=space[0].x + 1)
    assert dead == []


def test_z_commands_ignore_cross_lane_overlaps():
    """Bring forward / send back only reorder same-lane items: for a
    cross-lane rect overlap the lane decides the stacking, so the
    command must be a clean no-op (no churned z/undo state)."""
    space = model.Space('xl', VIDFORMAT, plugins.AudioFormat())
    a = model.Clip(type='video', x=0, y=0.0, length=10, height=1.5)
    b = model.Clip(type='video', x=5, y=1.0, length=10, height=1.0)
    space[0:0] = [a, b]
    assert b in a.overlap_items()          # rects overlap (x AND y)

    cmd = model.SendItemBackCommand(a)
    cmd.redo()
    assert (a.z, b.z) == (0, 1)            # untouched: lanes decide

    # same-lane pair still reorders
    b.update(y=0.0)
    cmd = model.SendItemBackCommand(a)
    cmd.redo()
    assert (a.z, b.z) == (1, 0)
    cmd.undo()
    assert (a.z, b.z) == (0, 1)


def run_yaml_roundtrip_fuzz(seed, n_ops=15):
    """Persistence differential: after a random edit script, the space
    dumped to YAML and loaded back must render IDENTICALLY on both the
    video and audio sides (reference space.py:211-221, items.py:775 —
    any render-relevant attribute the representers drop shows up as a
    pixel/sample divergence here, which single-example round-trip tests
    can miss)."""
    import yaml

    from canvas_tpu.editor.graph.audio import SpaceAudioManager

    rng = random.Random(9000 + seed)
    vnames = ['red', 'green', 'blue', 'gray']
    anames = ['a', 'b', 'c']
    slist = make_asset_list()
    for name, asset in make_audio_asset_list().items():
        slist[name] = asset

    space = model.Space('rt', VIDFORMAT,
                        plugins.AudioFormat(sample_rate=48000))
    items = [random_clip(rng, vnames) for _ in range(2)]
    items.append(model.Sequence(
        type='video', x=rng.randrange(0, 40), y=rng.uniform(0.0, 3.0),
        height=1.0,
        items=[random_seq_item(rng, vnames, first=True),
               random_seq_item(rng, vnames)]))
    items += [random_audio_clip(rng, anames) for _ in range(2)]
    space[0:0] = items

    for _ in range(n_ops):
        it = rng.choice(list(space))
        op = rng.choice(['move', 'resize', 'seq'])
        if op == 'move':
            it.update(x=rng.randrange(0, 70), y=rng.uniform(0.0, 3.0))
        elif op == 'resize' and not isinstance(it, model.Sequence):
            it.update(length=rng.randrange(1, 30),
                      offset=rng.randrange(0, 6))
        elif op == 'seq' and isinstance(it, model.Sequence):
            i = rng.randrange(len(it))
            length = rng.randrange(2, 12)
            it[i].update(offset=rng.randrange(0, 6), length=length,
                         transition_length=legal_transition_length(
                             rng, it, i, length=length))
            clamp_following_transition(it, i)

    loaded = yaml.load(yaml.dump(space), Loader=yaml.Loader)
    loaded._video_format = VIDFORMAT
    loaded._audio_format = plugins.AudioFormat(sample_rate=48000)
    loaded.fixup()

    assert (snapshot(SpaceVideoManager(loaded, slist))
            == snapshot(SpaceVideoManager(space, slist))), (
        'seed %d: video render diverged after YAML round trip' % seed)
    assert (audio_snapshot(SpaceAudioManager(loaded, slist))
            == audio_snapshot(SpaceAudioManager(space, slist))), (
        'seed %d: audio render diverged after YAML round trip' % seed)


@pytest.mark.parametrize('seed', range(max(4, _SEEDS // 2)))
def test_yaml_roundtrip_differential_fuzz(seed):
    run_yaml_roundtrip_fuzz(seed)


@pytest.mark.parametrize('seed', range(max(3, _SEEDS // 4)))
def test_editor_session_planner_cache_fuzz(seed):
    """Close the whole invalidation loop: a long-lived RenderPlanner
    (plan cache + persistent stage cache ON) watches a live
    SpaceVideoManager while random MODEL edits run through the graph
    layer. Every replay must be bit-equal to a fresh manager + fresh
    planner with all caches off — a graph signal that under-reports a
    changed range leaves pre-edit pixels in the plan/stage caches.
    (test_render_fuzz fires frames_updated by hand; this drives it
    through the real editor graph.)"""
    import numpy as np

    from canvas_tpu import render

    rng = random.Random(7000 + seed)
    names = ['red', 'green', 'blue', 'gray']
    slist = make_asset_list()
    space = model.Space('sess', VIDFORMAT, plugins.AudioFormat())
    space[0:0] = [random_clip(rng, names) for _ in range(3)]

    window = box2i(0, 0, 127, 95)
    live_mgr = SpaceVideoManager(space, slist)
    planner = render.RenderPlanner(live_mgr, window)
    planner.pipeline_chunk = 8

    def fresh_render(start, stop):
        mgr = SpaceVideoManager(space, slist)
        p = render.RenderPlanner(mgr, window)
        p.pipeline_chunk = 8
        p.stage_cache_mb = 0
        p.plan_cache_segments = 0
        out = np.asarray(p.render(start, stop))
        p.close()
        return out

    for step in range(12):
        clips = [it for it in space if not isinstance(it, model.Sequence)]
        op = rng.choice(['move', 'resize', 'restack', 'add', 'remove',
                         'render', 'render'])
        if op == 'move':
            rng.choice(list(space)).update(x=rng.randrange(0, 70),
                                           y=rng.uniform(0.0, 3.0))
        elif op == 'resize':
            rng.choice(clips).update(length=rng.randrange(1, 30),
                                     offset=rng.randrange(0, 6))
        elif op == 'restack':
            rng.choice(list(space)).update(y=rng.uniform(0.0, 3.0))
        elif op == 'add' and len(space) < 6:
            space[0:0] = [random_clip(rng, names)]
        elif op == 'remove' and len(space) > 2:
            del space[space.index(rng.choice(clips))]

        start = rng.randrange(0, 60)
        stop = start + rng.randrange(2, 10)
        got = np.asarray(planner.render(start, stop))
        want = fresh_render(start, stop)
        np.testing.assert_array_equal(
            got, want,
            err_msg='seed %d step %d op %s range %d:%d'
            % (seed, step, op, start, stop))
        # replay the same range immediately (pure cache hit) — must
        # still match
        again = np.asarray(planner.render(start, stop))
        np.testing.assert_array_equal(again, got)
    planner.close()
