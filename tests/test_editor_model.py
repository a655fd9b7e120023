"""Editor model + graph compilation tests.

Ports the reference's test strategy (tests/canvas/sequence.py: assert
*rendered pixel colors* after each edit; tests/canvas/SequenceCommands.py:
undo/redo semantics; tests/canvas/VideoSourceRefConnector.py: alert
behavior on missing/offline sources).
"""

import fractions

import pytest
import yaml

from canvas_tpu import process
from canvas_tpu.basetypes import box2i, rgba
from canvas_tpu.editor import model, plugins
from canvas_tpu.editor.graph.video import SequenceVideoManager, \
    SpaceVideoManager


class FailedSource(plugins.Source):
    """Refuses to come online (tests/canvas/VideoSourceRefConnector.py:6)."""

    def __init__(self, name):
        plugins.Source.__init__(self, name)
        self._load_error = plugins.Alert("Can't load maaaan", source=name,
                                         icon=plugins.AlertIcon.Error)

    def bring_online(self):
        self.show_alert(self._load_error)

    def get_stream(self, name):
        raise plugins.SourceOfflineError


class SilentFailedSource(plugins.Source):
    def __init__(self, name):
        plugins.Source.__init__(self, name)

    def bring_online(self):
        pass

    def get_stream(self, name):
        raise plugins.SourceOfflineError


def make_asset_list():
    slist = model.AssetList()
    for name, color in (('red', (100, 0, 0)), ('green', (0, 100, 0)),
                        ('blue', (0, 0, 100))):
        source = process.SolidColorVideoSource(
            process.LerpFunc((0, 0, 0, 1),
                             (color[0], color[1], color[2], 1), 100))
        slist[name] = model.RuntimeSourceAsset(model.RuntimeSource(
            name, {'video': plugins.VideoStream(source)}))
    slist['noload'] = model.RuntimeSourceAsset(FailedSource('noload'))
    slist['noload_silent'] = model.RuntimeSourceAsset(
        SilentFailedSource('noload_silent'))
    slist['nostreams'] = model.RuntimeSourceAsset(
        model.RuntimeSource('nostreams', {}))
    return slist


def getcolor(source, frame):
    return source.get_frame_f32(frame, box2i(0, 0, 0, 0)).pixel(0, 0)


vidformat = plugins.VideoFormat()


def check1(source):
    """Ten frames of red, cut to green, then 5-frame fade to blue
    (tests/canvas/sequence.py:55-100)."""
    colors = [getcolor(source, i) for i in range(0, 30)]

    for i in range(0, 10):
        assert colors[i].r == pytest.approx(float(i + 1), abs=1e-5), i
        assert colors[i].g == pytest.approx(0.0, abs=1e-5), i
        assert colors[i].b == pytest.approx(0.0, abs=1e-5), i
        assert colors[i].a == pytest.approx(1.0, abs=1e-5), i
    for i in range(10, 15):
        assert colors[i].r == pytest.approx(0.0, abs=1e-5), i
        assert colors[i].g == pytest.approx(float(i - 10 + 1), abs=1e-5), i
        assert colors[i].b == pytest.approx(0.0, abs=1e-5), i
    for i in range(15, 20):
        assert colors[i].r == pytest.approx(0.0, abs=1e-5), i
        assert colors[i].g == pytest.approx(
            float(i - 10 + 1) * (1.0 - float(i - 15) / 5.0), abs=1e-4), i
        assert colors[i].b == pytest.approx(
            float(i - 15 + 1) * float(i - 15) / 5.0, abs=1e-4), i
        assert colors[i].a == pytest.approx(1.0, abs=1e-5), i
    for i in range(20, 25):
        assert colors[i].r == pytest.approx(0.0, abs=1e-5), i
        assert colors[i].g == pytest.approx(0.0, abs=1e-5), i
        assert colors[i].b == pytest.approx(float(i - 15 + 1), abs=1e-5), i
    for i in range(25, 30):
        assert colors[i] is None, i


def make_check1_sequence():
    return model.Sequence(type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef('red', 'video'),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('green', 'video'),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('blue', 'video'),
                           offset=1, length=10, transition_length=5)])


def check_no_alerts(publisher):
    assert not publisher.alerts, str(publisher.alerts[0])


def test_sequence_manager_start():
    """tests/canvas/sequence.py test_1_start"""
    sequence = make_check1_sequence()
    manager = SequenceVideoManager(sequence, make_asset_list(), vidformat)
    check_no_alerts(manager)
    check1(manager)


def test_sequence_manager_adjust_lengths():
    """tests/canvas/sequence.py test_1_adjlen1: reshape wrong lengths
    into the check1 shape via updates."""
    slist = make_asset_list()
    sequence = model.Sequence(type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef('red', 'video'),
                           offset=1, length=7),
        model.SequenceItem(source=model.AssetStreamRef('green', 'video'),
                           offset=1, length=19),
        model.SequenceItem(source=model.AssetStreamRef('blue', 'video'),
                           offset=1, length=100, transition_length=5)])
    manager = SequenceVideoManager(sequence, slist, vidformat)

    sequence[0].update(length=10)
    sequence[1].update(length=10)
    sequence[2].update(length=10)
    check_no_alerts(manager)
    check1(manager)


def test_sequence_manager_replace_source():
    """Swapping an item's source ref updates the rendered frames."""
    slist = make_asset_list()
    sequence = make_check1_sequence()
    manager = SequenceVideoManager(sequence, slist, vidformat)

    sequence[0].update(source=model.AssetStreamRef('green', 'video'))
    color = getcolor(manager, 5)
    assert color.g == pytest.approx(6.0, abs=1e-5)
    assert color.r == pytest.approx(0.0, abs=1e-5)


def test_sequence_manager_missing_source_alert():
    slist = make_asset_list()
    sequence = model.Sequence(type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef('missing', 'video'),
                           offset=0, length=10)])
    manager = SequenceVideoManager(sequence, slist, vidformat)
    assert manager.alerts
    assert 'missing' in str(manager.alerts[0])
    # pulls degrade to empty
    assert getcolor(manager, 5) is None


def test_space_video_manager_composite():
    """SpaceVideoManager composites z-ordered clips; edits propagate
    (graph/video.py:32-130)."""
    slist = make_asset_list()
    audio_format = plugins.AudioFormat(sample_rate=48000)
    space = model.Space('test', vidformat, audio_format)

    clip_red = model.Clip(type='video', x=0, y=0.0, length=20, height=1.0,
                          source=model.AssetStreamRef('red', 'video'),
                          offset=0)
    clip_blue = model.Clip(type='video', x=5, y=1.0, length=10, height=1.0,
                           source=model.AssetStreamRef('blue', 'video'),
                           offset=0)
    space[0:0] = [clip_red, clip_blue]

    manager = SpaceVideoManager(space, slist)
    check_no_alerts(manager)

    # Space z semantics: index == z, and LOWER z is on top
    # (BringItemForwardCommand moves toward smaller z) — red (z=0) wins
    # during the overlap
    color = getcolor(manager, 7)
    assert color.r == pytest.approx(7.0, abs=1e-4)
    # move red out of the way; blue (frame 7 - x 5 = source frame 2) shows
    clip_red.update(x=100)
    color = getcolor(manager, 7)
    assert color.b == pytest.approx(2.0, abs=1e-4)

    # remove blue: frame 7 is now empty
    del space[space.index(clip_blue)]
    assert getcolor(manager, 7) is None


def test_space_overlaps_and_anchors():
    space = model.Space('s', vidformat, plugins.AudioFormat())
    a = model.Clip(type='video', x=0, y=0.0, length=10, height=1.0)
    b = model.Clip(type='video', x=5, y=0.5, length=10, height=1.0)
    c = model.Clip(type='video', x=30, y=0.0, length=10, height=1.0)
    space[0:0] = [a, b, c]

    assert space.find_overlaps(a) == [b]
    assert space.find_overlaps_recursive(a) == {b}
    assert space.find_overlaps(c) == []

    # anchors
    b.update(anchor=model.Anchor(target=a, offset_ns=0))
    assert space.find_anchored_items(a) == {b}
    assert b.anchor_target is a
    b.update(anchor=None)
    assert space.find_anchored_items(a) == set()


def test_z_sort_key_total_order():
    """z_sort_key returns the deterministic (-y, -z) total order, NOT
    the reference's comparator object (items.py:21-52 there), whose
    overlap-gated z-vs-y fallback is intransitive. Pins: higher lane
    (y) sorts first; within a lane higher z sorts first; keys are
    plain comparable tuples usable in sorted structures; and the
    y=None/z=None overrides preview a move without mutating the item."""
    space = model.Space('s', vidformat, plugins.AudioFormat())
    low = model.Clip(type='video', x=0, y=0.0, length=10, height=1.0)
    high = model.Clip(type='video', x=0, y=0.0, length=10, height=1.0)
    lane_up = model.Clip(type='video', x=0, y=2.0, length=10, height=1.0)
    space[0:0] = [low, high, lane_up]
    low.update(z=0)
    high.update(z=3)
    lane_up.update(z=0)

    keys = sorted([low, high, lane_up], key=lambda i: i.z_sort_key())
    assert keys == [lane_up, high, low]

    # Overrides preview a candidate position (reference signature).
    assert low.z_sort_key(z=5) < high.z_sort_key()
    assert low.z_sort_key(y=3.0) < lane_up.z_sort_key()
    assert low.z_sort_key() == (0.0, 0)
    # Total order: transitive by construction (tuple comparison), which
    # the reference's comparator is not — that difference is the point.
    assert (lane_up.z_sort_key() < high.z_sort_key() <
            low.z_sort_key(z=-1))


def test_undo_stack_update_command():
    space = model.Space('s', vidformat, plugins.AudioFormat())
    clip = model.Clip(type='video', x=0, y=0.0, length=10, height=1.0)
    space[0:0] = [clip]

    stack = model.UndoStack()
    stack.push(model.MoveItemCommand(clip, 5, 2.0))
    assert clip.x == 5 and clip.y == 2.0
    stack.undo()
    assert clip.x == 0 and clip.y == 0.0
    stack.redo()
    assert clip.x == 5


def test_undo_adjust_clip_commands():
    space = model.Space('s', vidformat, plugins.AudioFormat())
    clip = model.Clip(type='video', x=10, y=0.0, length=10, height=1.0,
                      offset=3)
    space[0:0] = [clip]
    stack = model.UndoStack()

    stack.push(model.AdjustClipStartCommand(clip, 2))
    assert (clip.x, clip.offset, clip.length) == (12, 5, 8)
    stack.push(model.AdjustClipLengthCommand(clip, 4))
    assert clip.length == 12
    stack.undo()
    assert clip.length == 8
    stack.undo()
    assert (clip.x, clip.offset, clip.length) == (10, 3, 10)

    with pytest.raises(model.NoRoomError):
        model.AdjustClipLengthCommand(clip, -10)


def test_undo_remove_insert_item():
    space = model.Space('s', vidformat, plugins.AudioFormat())
    a = model.Clip(type='video', x=0, length=10)
    b = model.Clip(type='video', x=20, length=10)
    space[0:0] = [a, b]

    stack = model.UndoStack()
    stack.push(model.RemoveItemCommand(space, a))
    assert len(space) == 1 and space[0] is b
    assert b.z == 0
    stack.undo()
    assert len(space) == 2
    assert space[0].x == 0


def test_sequence_remove_adjacent_preserves_timing():
    """RemoveAdjacentItemsFromSequenceCommand keeps later items in place
    (commands.py:613-675)."""
    slist = make_asset_list()
    sequence = make_check1_sequence()
    space = model.Space('s', vidformat, plugins.AudioFormat())
    sequence.update(x=7)
    space[0:0] = [sequence]

    # blue starts at x=15 within the sequence
    assert sequence[2].x == 15

    stack = model.UndoStack()
    cmd = model.RemoveAdjacentItemsFromSequenceCommand([sequence[1]])
    stack.push(cmd)
    assert len(sequence) == 2
    stack.undo()
    assert len(sequence) == 3
    assert sequence[2].x == 15
    assert sequence[1].source.asset_path == 'green'


def test_sequence_mover_to_item():
    seq_items = [
        model.SequenceItem(source=model.AssetStreamRef('red', 'video'),
                           offset=0, length=10),
        model.SequenceItem(source=model.AssetStreamRef('green', 'video'),
                           offset=0, length=10, transition_length=3)]
    mover = model.SequenceItemsMover(seq_items)
    item = mover.to_item(height=2.0, x=5, y=1.0)
    assert isinstance(item, model.Sequence)
    assert item.x == 5
    assert item.length == 17

    single = model.SequenceItemsMover([
        model.SequenceItem(source=model.AssetStreamRef('red', 'video'),
                           offset=2, length=8)])
    clip = single.to_item(height=1.0, x=0, y=0)
    assert isinstance(clip, model.Clip)
    assert clip.length == 8
    assert clip.offset == 2


def test_yaml_round_trip_space():
    """Model persistence: YAML out and back (space.py:211-221 +
    items.py:775)."""
    space = model.Space('s', vidformat, plugins.AudioFormat())
    seq = make_check1_sequence()
    clip = model.Clip(type='video', x=3, y=1.0, length=5, height=1.0,
                      source=model.AssetStreamRef('red', 'video'), offset=2)
    space[0:0] = [clip, seq]

    text = yaml.dump(space)
    assert '!CanvasSpace' in text
    assert '!CanvasClip' in text
    assert '!CanvasSequenceItem' in text

    loaded = yaml.load(text, Loader=yaml.Loader)
    loaded._video_format = vidformat
    loaded._audio_format = plugins.AudioFormat()
    loaded.fixup()
    assert len(loaded) == 2
    assert loaded[0].x == 3
    assert loaded[0].source.asset_path == 'red'
    assert len(loaded[1]) == 3
    assert loaded[1][2].transition_length == 5
    # renders identically
    manager = SequenceVideoManager(loaded[1], make_asset_list(), vidformat)
    check1(manager)


def test_ref_connector_failed_sources():
    """tests/canvas/VideoSourceRefConnector.py behaviors."""
    slist = make_asset_list()

    conn = model.VideoSourceRefConnector(
        slist, model.AssetStreamRef('noload', 'video'))
    assert conn.alerts      # followed from the failing source
    assert getcolor(conn, 0) is None

    conn = model.VideoSourceRefConnector(
        slist, model.AssetStreamRef('noload_silent', 'video'))
    assert conn.alerts      # connector adds its own alert
    assert 'Unable to bring source' in str(conn.alerts[0])

    conn = model.VideoSourceRefConnector(
        slist, model.AssetStreamRef('nostreams', 'video'))
    assert conn.alerts
    assert "Can't find stream" in str(conn.alerts[0])

    # working ref has no alerts and yields pixels
    conn = model.VideoSourceRefConnector(
        slist, model.AssetStreamRef('red', 'video'))
    assert not conn.alerts
    assert getcolor(conn, 4).r == pytest.approx(4.0, abs=1e-4)

    # switching the ref fixes a broken connector
    conn2 = model.VideoSourceRefConnector(
        slist, model.AssetStreamRef('missing', 'video'))
    assert conn2.alerts
    conn2.set_ref(model.AssetStreamRef('blue', 'video'))
    assert not conn2.alerts
    assert getcolor(conn2, 4).b == pytest.approx(4.0, abs=1e-4)


def test_space_audio_manager_with_sequence():
    """Audio sequences compile (SequenceAudioManager — the reference
    leaves this as a TODO, graph/audio.py:84)."""
    from canvas_tpu.audio import AudioFrame, AudioSource
    from canvas_tpu.editor.graph.audio import SpaceAudioManager
    import numpy as np

    class ConstAudio(AudioSource):
        def __init__(self, value):
            self.value = value

        def _render(self, frame):
            frame.data = np.full(
                (frame.full_max_sample - frame.full_min_sample + 1,
                 frame.channels), self.value, np.float32)
            frame.current_min_sample = frame.full_min_sample
            frame.current_max_sample = frame.full_max_sample

    slist = model.AssetList()
    slist['tone'] = model.RuntimeSourceAsset(model.RuntimeSource(
        'tone', {'audio': plugins.AudioStream(ConstAudio(0.5))}))
    slist['tone2'] = model.RuntimeSourceAsset(model.RuntimeSource(
        'tone2', {'audio': plugins.AudioStream(ConstAudio(0.25))}))

    audio_format = plugins.AudioFormat(sample_rate=48000)
    space = model.Space('s', vidformat, audio_format)
    seq = model.Sequence(type='audio', items=[
        model.SequenceItem(source=model.AssetStreamRef('tone', 'audio'),
                           offset=0, length=100),
        model.SequenceItem(source=model.AssetStreamRef('tone2', 'audio'),
                           offset=0, length=100, transition_length=20)])
    space[0:0] = [seq]

    manager = SpaceAudioManager(space, slist)
    assert not manager.alerts, str(manager.alerts[0])

    frame = manager.get_frame(0, 199, 1)
    import numpy as np
    data = np.asarray(frame.data)[:, 0]
    # first clip alone
    assert data[10] == pytest.approx(0.5)
    # transition overlap CROSSFADES with linear ramps (matching the
    # video mix curve): at overlap sample k=10 of tl=20, outgoing
    # 0.5*(1-10/20) + incoming 0.25*(10/20) = 0.375
    assert data[90] == pytest.approx(0.375)
    # ramps sum to unity: equal signals would pass unchanged
    assert data[80] == pytest.approx(0.5 * 1.0 + 0.25 * 0.0)
    assert data[99] == pytest.approx(0.5 * (1 - 19 / 20) + 0.25 * (19 / 20))
    # second clip alone
    assert data[150] == pytest.approx(0.25)


class UpdateTracker:
    """Accumulates frames_updated dirty ranges
    (tests/canvas/sequence.py:43-53)."""

    def __init__(self, track):
        track.frames_updated.connect(self.update_frames)
        self.reset()

    def update_frames(self, *args):
        # graph managers fire (min, max); stream wrappers fire
        # (stream, min, max) — accept both like the reference's loose
        # signal contract
        min_frame, max_frame = args[-2], args[-1]
        if min_frame is None or max_frame is None:
            return
        self.min_frame = min(min_frame, self.min_frame
                             if self.min_frame is not None else min_frame)
        self.max_frame = max(max_frame, self.max_frame
                             if self.max_frame is not None else max_frame)

    def reset(self):
        self.min_frame, self.max_frame = None, None


def test_sequence_manager_dirty_ranges():
    """tests/canvas/sequence.py test_1_adjlen1 dirty-range assertions."""
    slist = make_asset_list()
    sequence = model.Sequence(type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef('red', 'video'),
                           offset=1, length=7),
        model.SequenceItem(source=model.AssetStreamRef('green', 'video'),
                           offset=1, length=19),
        model.SequenceItem(source=model.AssetStreamRef('blue', 'video'),
                           offset=1, length=100, transition_length=5)])
    manager = SequenceVideoManager(sequence, slist, vidformat)
    track = UpdateTracker(manager)
    assert not manager.alerts

    sequence[0].update(length=10)
    assert track.min_frame == 7
    assert track.max_frame == 10 + 19 + 100 - 5 - 1
    track.reset()

    sequence[1].update(length=10)
    assert track.min_frame == 15
    assert track.max_frame == 10 + 19 + 100 - 5 - 1
    track.reset()

    sequence[2].update(length=10)
    assert track.min_frame == 25
    assert track.max_frame == 10 + 10 + 100 - 5 - 1
    track.reset()

    check1(manager)


# --- remaining SequenceVideoManager walks (tests/canvas/sequence.py) -------

def check2(source):
    """Five frames red, crossfade to green, then IMMEDIATELY crossfade
    to blue (sequence.py:281-318)."""
    colors = [getcolor(source, i) for i in range(0, 25)]
    for i in range(0, 5):
        assert colors[i].r == pytest.approx(float(i + 1), abs=1e-5), i
        assert colors[i].g == pytest.approx(0.0, abs=1e-5), i
    for i in range(5, 10):
        assert colors[i].r == pytest.approx(
            float(i + 1) * (1.0 - float(i - 5) / 5.0), abs=1e-4), i
        assert colors[i].g == pytest.approx(
            float(i - 5 + 1) * float(i - 5) / 5.0, abs=1e-4), i
        assert colors[i].b == pytest.approx(0.0, abs=1e-5), i
    for i in range(10, 15):
        assert colors[i].r == pytest.approx(0.0, abs=1e-5), i
        assert colors[i].g == pytest.approx(
            float(i - 5 + 1) * (1.0 - float(i - 10) / 5.0), abs=1e-4), i
        assert colors[i].b == pytest.approx(
            float(i - 10 + 1) * float(i - 10) / 5.0, abs=1e-4), i
    for i in range(15, 20):
        assert colors[i].g == pytest.approx(0.0, abs=1e-5), i
        assert colors[i].b == pytest.approx(float(i - 10 + 1), abs=1e-5), i
    for i in range(20, 25):
        assert colors[i] is None, i


def _seq(*triples):
    return model.Sequence(type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef(name, 'video'),
                           offset=off, length=ln, transition_length=tl)
        for (name, off, ln, tl) in triples])


def test_check2_start():
    seq = _seq(('red', 1, 10, 0), ('green', 1, 10, 5), ('blue', 1, 10, 5))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    assert not manager.alerts
    check2(manager)


def test_check2_add_transitions():
    seq = _seq(('red', 1, 10, 0), ('green', 1, 10, 0), ('blue', 1, 10, 0))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    seq[1].update(transition_length=5)
    seq[2].update(transition_length=5)
    check2(manager)


def test_check2_insert_green():
    seq = _seq(('red', 1, 10, 0), ('blue', 1, 10, 5))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    seq.insert(1, model.SequenceItem(
        source=model.AssetStreamRef('green', 'video'), offset=1, length=10,
        transition_length=5))
    check2(manager)


@pytest.mark.parametrize('t1,t2', [(7, 3), (3, 7)])
def test_check2_adjust_transitions(t1, t2):
    seq = _seq(('red', 1, 10, 0), ('green', 1, 10, t1), ('blue', 1, 10, t2))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    seq[1].update(transition_length=5)
    seq[2].update(transition_length=5)
    check2(manager)


def check3(source):
    """Ten frames red, five EMPTY (gap), five green, crossfade to blue
    (sequence.py:382-428)."""
    colors = [getcolor(source, i) for i in range(0, 35)]
    for i in range(0, 10):
        assert colors[i].r == pytest.approx(float(i + 1), abs=1e-5), i
    for i in range(10, 15):
        assert colors[i] is None, i
    for i in range(15, 20):
        assert colors[i].g == pytest.approx(float(i - 15 + 1), abs=1e-5), i
        assert colors[i].r == pytest.approx(0.0, abs=1e-5), i
    for i in range(20, 25):
        assert colors[i].g == pytest.approx(
            float(i - 15 + 1) * (1.0 - float(i - 20) / 5.0), abs=1e-4), i
        assert colors[i].b == pytest.approx(
            float(i - 20 + 1) * float(i - 20) / 5.0, abs=1e-4), i
    for i in range(25, 30):
        assert colors[i].b == pytest.approx(float(i - 20 + 1), abs=1e-5), i
    for i in range(30, 35):
        assert colors[i] is None, i


def test_check3_gap_via_negative_transition():
    seq = _seq(('red', 1, 10, 0), ('green', 1, 10, 0), ('blue', 1, 10, 0))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    assert not manager.alerts
    seq[1].update(transition_length=-5)
    seq[2].update(transition_length=5)
    check3(manager)


def test_dirty_ranges_adjlen2():
    """sequence.py test_1_adjlen2 exact dirty ranges, different order."""
    seq = _seq(('red', 1, 17, 0), ('green', 1, 5, 0), ('blue', 1, 22, 5))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    track = UpdateTracker(manager)

    seq[2].update(length=10)
    assert (track.min_frame, track.max_frame) == (27, 17 + 5 + 22 - 5 - 1)
    track.reset()
    seq[0].update(length=10)
    assert (track.min_frame, track.max_frame) == (10, 17 + 5 + 10 - 5 - 1)
    track.reset()
    seq[1].update(length=10)
    assert (track.min_frame, track.max_frame) == (10, 10 + 10 + 10 - 5 - 1)
    check1(manager)


def test_dirty_ranges_adjust_transition_length():
    """sequence.py test_1_adjtranslength."""
    seq = _seq(('red', 1, 10, 0), ('green', 1, 10, 3), ('blue', 1, 10, 7))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    track = UpdateTracker(manager)

    seq[1].update(transition_length=0)
    assert (track.min_frame, track.max_frame) == (7, 10 + 10 + 10 - 7 - 1)
    track.reset()
    seq[2].update(transition_length=5)
    assert (track.min_frame, track.max_frame) == (13, 10 + 10 + 10 - 5 - 1)
    check1(manager)


def test_dirty_ranges_add_one_at_a_time():
    """sequence.py test_1_add."""
    seq = _seq(('green', 1, 10, 0))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    track = UpdateTracker(manager)

    seq.append(model.SequenceItem(
        source=model.AssetStreamRef('blue', 'video'), offset=1, length=10,
        transition_length=5))
    assert (track.min_frame, track.max_frame) == (5, 14)
    track.reset()
    seq.insert(0, model.SequenceItem(
        source=model.AssetStreamRef('red', 'video'), offset=1, length=10))
    assert (track.min_frame, track.max_frame) == (0, 10 + 10 + 10 - 5 - 1)
    check1(manager)


def test_dirty_ranges_add_multiple():
    """sequence.py test_1_addmultiple."""
    seq = _seq(('red', 1, 10, 0))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    track = UpdateTracker(manager)

    seq.extend([
        model.SequenceItem(source=model.AssetStreamRef('green', 'video'),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('blue', 'video'),
                           offset=1, length=10, transition_length=5)])
    assert (track.min_frame, track.max_frame) == (10, 10 + 10 + 10 - 5 - 1)
    check1(manager)


def test_dirty_ranges_remove_one_at_a_time():
    """sequence.py test_1_remove."""
    seq = _seq(('red', 1, 10, 0), ('blue', 25, 14, 2), ('green', 1, 10, 0),
               ('blue', 9, 7, 0), ('blue', 1, 10, 5))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    track = UpdateTracker(manager)

    del seq[1]
    assert track.min_frame == 8
    assert track.max_frame == 10 + 14 + 10 + 7 + 10 - 5 - 2 - 1
    track.reset()
    del seq[2]
    assert track.min_frame == 15
    assert track.max_frame == 10 + 10 + 7 + 10 - 5 - 1
    check1(manager)


def test_dirty_ranges_remove_ends():
    """sequence.py test_1_removeends (slice deletion + end deletion)."""
    seq = _seq(('green', 9, 114, 0), ('red', 23, 8, 5), ('red', 1, 10, 0),
               ('green', 1, 10, 0), ('blue', 1, 10, 5), ('blue', 9, 7, 0))
    manager = SequenceVideoManager(seq, make_asset_list(), vidformat)
    track = UpdateTracker(manager)

    seq[0:2] = []
    assert track.min_frame == 0
    assert track.max_frame == 114 + 8 + 10 + 10 + 10 + 7 - 5 - 5 - 1
    track.reset()
    del seq[3]
    assert track.min_frame == 10 + 10 + 10 - 5
    assert track.max_frame == 10 + 10 + 10 + 7 - 5 - 1
    check1(manager)


def test_space_manager_scales_to_many_clips():
    """Timeline-length independence (SURVEY §5): a 300-clip space
    compiles fast, pulls are O(active layers), and edits propagate
    without rebuilding the world."""
    import time

    slist = make_asset_list()
    audio_format = plugins.AudioFormat(sample_rate=48000)
    space = model.Space('big', vidformat, audio_format)
    items = [model.Clip(type='video', x=i * 3, y=float(i % 7), length=10,
                        height=1.0, offset=0,
                        source=model.AssetStreamRef(
                            ('red', 'green', 'blue')[i % 3], 'video'))
             for i in range(300)]
    space[0:0] = items

    t0 = time.perf_counter()
    mgr = SpaceVideoManager(space, slist)
    assert time.perf_counter() - t0 < 5.0
    f = mgr.get_frame_f16(450, box2i(0, 0, 15, 15))
    assert not f.current_window.empty()

    t0 = time.perf_counter()
    items[150].update(x=500)
    assert time.perf_counter() - t0 < 0.5


def test_plugin_source_alert_keeps_traceback():
    """A failing create_source publishes an alert whose exc_info holds
    the LIVE traceback (round-3 review: the staged bring_online must
    raise the alert inside the except block, or Alert captures
    (None, None, None))."""
    from canvas_tpu.editor import plugins
    from canvas_tpu.editor.model import PluginSource

    class Boom(plugins.SourcePlugin):
        plugin_urn = 'urn:test:boom'
        name = 'Boom'

        @classmethod
        def create_source(cls, name, definition):
            raise ValueError('kapow')

    plugins.PluginManager.load_all()
    plugins.PluginManager.plugins['urn:test:boom'] = Boom
    plugins.PluginManager.enabled_plugins['urn:test:boom'] = Boom
    try:
        src = PluginSource('b', 'urn:test:boom', {})
        shown = []
        src.show_alert = shown.append
        src.bring_online()
        assert src.offline
        assert shown
        alert = shown[0]
        assert alert.exc_info is not None
        assert alert.exc_info[0] is ValueError
        assert 'kapow' in str(alert) and 'Traceback' in str(alert)
    finally:
        plugins.PluginManager.plugins.pop('urn:test:boom', None)
        plugins.PluginManager.enabled_plugins.pop('urn:test:boom', None)


def test_edit_ranged_invalidation_reaches_planner():
    """End-to-end: a model edit propagates a RANGED frames_updated
    through SpaceVideoManager to a connected RenderPlanner, which keeps
    prepared plans for untouched segments and re-renders the dirty
    range correctly (render.py ranged invalidation x graph dirty
    ranges)."""
    import numpy as np

    from canvas_tpu import render

    slist = make_asset_list()
    space = model.Space('test', vidformat, plugins.AudioFormat())
    clip_red = model.Clip(type='video', x=0, y=0.0, length=64, height=1.0,
                          source=model.AssetStreamRef('red', 'video'),
                          offset=0)
    clip_blue = model.Clip(type='video', x=40, y=1.0, length=20, height=1.0,
                           source=model.AssetStreamRef('blue', 'video'),
                           offset=0)
    space[0:0] = [clip_red, clip_blue]
    manager = SpaceVideoManager(space, slist)

    window = box2i(0, 0, 31, 23)
    planner = render.RenderPlanner(manager, window)
    planner.pipeline_chunk = 64
    for (_s, _n, o) in planner.iter_batches(0, 64, batch=8):
        np.asarray(o)
    segs_before = sorted(k[0] for k in planner._plan_cache)
    assert (0, 40) in segs_before          # red-only segment

    # edit touches only the blue clip's span: the red-only segment's
    # plan must survive, the overlapping ones must drop
    clip_blue.update(offset=5)           # dirty range: [40, 59]
    segs_after = sorted(k[0] for k in planner._plan_cache)
    assert (0, 40) in segs_after
    assert all(s1 <= 40 or s0 >= 60 for (s0, s1) in segs_after)

    # re-render both ranges and compare against the eager pull
    got = {s: np.asarray(o)[:n] for (s, n, o) in
           planner.iter_batches(0, 64, batch=8)}
    for i in (3, 45):
        want = manager.get_frame_f16(i, window)
        expect = (np.zeros((4, 24, 32), np.float16)
                  if want.current_window.empty()
                  else np.asarray(want.data, np.float16))
        np.testing.assert_array_equal(got[(i // 8) * 8][i % 8], expect,
                                      err_msg='frame %d' % i)


def test_multi_item_splice_signals_in_index_order():
    """A multi-item sequence splice (paste / undo-restore) must emit
    item_added in INDEX order: the video manager inserts watcher lists
    by item.index, and frozenset-ordered emission that delivered a high
    index before its siblings crashed mid-signal (confirmed 166/200
    trials before the fix)."""
    slist = make_asset_list()
    for _trial in range(50):
        seq = model.Sequence(type='video', x=0, y=0.0, height=1.0, items=[
            model.SequenceItem(source=model.AssetStreamRef('red', 'video'),
                               length=10, offset=0, transition_length=0)])
        manager = SequenceVideoManager(seq, slist, vidformat)
        new = [model.SequenceItem(source=model.AssetStreamRef('green',
                                                              'video'),
                                  length=8, offset=0, transition_length=0)
               for _ in range(3)]
        seq[1:1] = new                       # crashes pre-fix
        assert len(manager.watchers) == 4
    # rendered output stays consistent with the model
    color = getcolor(manager, 12)
    assert color is not None


def test_sourceless_video_item_degrades_to_empty():
    """An item with neither Sequence type nor a source attribute (the
    placeholder shape) must add as an EMPTY layer, not crash
    follow_alerts with a weakref-to-None TypeError."""
    space = model.Space('s', vidformat, plugins.AudioFormat())
    mgr = SpaceVideoManager(space, make_asset_list())

    class Bare(model.Item):
        def type(self):
            return 'video'

    item = Bare(x=0, y=0.0, length=10, height=1.0)
    space[0:0] = [item]                      # crashed pre-fix
    assert getcolor(mgr, 5) is None          # renders empty
    del space[0]
    assert len(mgr.watchers) == 0


def test_yaml_round_trip_keywords():
    """PyYAML fills nested sequences AFTER a shallow constructor runs;
    the constructors must construct deep or frozenset(keywords) copies
    the empty placeholder and every save/load strips keywords
    (reference inherits this bug: fluggo/editor/model/sources.py:86)."""
    from canvas_tpu.editor.model import assets as assets_mod

    asset = assets_mod.Asset(name='a', keywords=['sunset', 'b-roll'])
    loaded = yaml.load(yaml.dump(asset), Loader=yaml.Loader)
    assert loaded.keywords == frozenset(['sunset', 'b-roll'])

    space = model.Space('s', vidformat, plugins.AudioFormat())
    sa = assets_mod.SpaceAsset(space, name='comp', keywords=['wip'])
    loaded = yaml.load(yaml.dump(sa), Loader=yaml.Loader)
    assert loaded.keywords == frozenset(['wip'])


def test_plugin_source_missing_plugin_alert():
    """bring_online with an unknown plugin URN publishes the
    'unavailable or disabled' alert with a Retry action and stays
    offline (sources.py:233-368 failure semantics)."""
    from canvas_tpu.editor.model.assets import PluginSource

    src = PluginSource('clip1', 'urn:canvas-tpu/plugins:does-not-exist',
                       {'path': 'x.dv'})
    src.bring_online()
    assert src.offline
    assert src.alerts
    alert = src.alerts[0]
    assert 'unavailable or disabled' in str(alert)
    names = [action[0] for action in alert.actions]
    assert 'Retry' in names


def test_asset_list_replace_announces_removal_first():
    """Replacing a name orphans the old asset AFTER removed() handlers
    ran (they see it still listed), then adopts the new one."""
    from canvas_tpu.editor.model.assets import Asset, AssetList

    assets = AssetList()
    old, new = Asset(name=None), Asset(name=None)
    assets['a'] = old
    seen = []
    assets.removed.connect(
        lambda name: seen.append((name, assets.assets.get(name),
                                  assets.assets[name].name)))
    assets['a'] = new
    assert seen == [('a', old, 'a')]
    assert old.name is None and old._asset_list is None
    assert assets['a'] is new and new.name == 'a'
    del assets['a']
    assert new.name is None and len(assets) == 0
