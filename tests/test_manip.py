"""Drag manipulators (port of key behaviors from
/root/reference/tests/canvas/ItemManipulator.py)."""

import pytest

from canvas_tpu.editor import model, plugins
from canvas_tpu.editor.model.manip import (ClipManipulator, ItemManipulator,
                                           SequenceItemGroupManipulator,
                                           SequenceManipulator)

vidformat = plugins.VideoFormat(frame_rate=1)
audformat = plugins.AudioFormat(sample_rate=1)


def make_space():
    return model.Space('s', vidformat, audformat)


def make_clip(x=0, y=0.0, length=10):
    return model.Clip(type='video', x=x, y=y, length=length, height=1.0,
                      source=model.AssetStreamRef('red', 'video'), offset=0)


def make_sequence(x=0, y=0.0):
    return model.Sequence(type='video', x=x, y=y, height=1.0, items=[
        model.SequenceItem(source=model.AssetStreamRef('red', 'video'),
                           offset=0, length=10),
        model.SequenceItem(source=model.AssetStreamRef('green', 'video'),
                           offset=0, length=10),
        model.SequenceItem(source=model.AssetStreamRef('blue', 'video'),
                           offset=0, length=10, transition_length=5)])


def test_clip_move_in_space():
    space = make_space()
    clip = make_clip(x=0, y=0.0)
    space[0:0] = [clip]

    manip = ClipManipulator(clip, grab_x=2.0, grab_y=0.0)
    assert clip.in_motion
    manip.set_space_item(space, 12.0, 3.0)
    assert clip.x == 10        # 12 + offset_x(0-2)
    assert clip.y == 3.0

    manip.set_space_item(space, 22.0, 1.0)
    assert clip.x == 20

    command = manip.finish()
    assert not clip.in_motion
    command.undo()
    assert clip.x == 0 and clip.y == 0.0
    command.redo()
    assert clip.x == 20


def test_clip_manipulator_reset():
    space = make_space()
    clip = make_clip(x=5)
    space[0:0] = [clip]

    manip = ClipManipulator(clip, grab_x=5.0, grab_y=0.0)
    manip.set_space_item(space, 30.0, 2.0)
    assert clip.x == 30
    manip.reset()
    assert clip.x == 5 and clip.y == 0.0
    assert not clip.in_motion


def test_clip_into_sequence():
    """Dragging a clip into a sequence converts it to a sequence item
    (manip.py:93-161)."""
    space = make_space()
    clip = make_clip(x=100, length=10)
    seq = make_sequence(x=0)
    space[0:0] = [clip, seq]

    manip = ClipManipulator(clip, grab_x=100.0, grab_y=0.0)
    # append at the end of the sequence (sequence length is 25)
    manip.set_sequence_item(seq, float(seq.length), 'add')
    assert len(seq) == 4
    assert clip.space is None       # removed from the space

    command = manip.finish()
    assert len(seq) == 4
    command.undo()
    assert len(seq) == 3
    assert clip.space is space
    assert clip.x == 100
    command.redo()
    assert len(seq) == 4


def test_clip_sequence_then_back_to_space():
    space = make_space()
    clip = make_clip(x=100, length=10)
    seq = make_sequence(x=0)
    space[0:0] = [clip, seq]

    manip = ClipManipulator(clip, grab_x=100.0, grab_y=0.0)
    manip.set_sequence_item(seq, float(seq.length), 'add')
    assert len(seq) == 4
    # drag back out into space
    manip.set_space_item(space, 50.0, 0.0)
    assert len(seq) == 3
    assert clip.space is space
    assert clip.x == 50
    command = manip.finish()
    command.undo()
    assert clip.x == 100


def test_sequence_item_group_slide_in_place():
    space = make_space()
    seq = make_sequence(x=0)
    space[0:0] = [seq]

    item = seq[1]
    original_x = item.x
    manip = SequenceItemGroupManipulator([item], grab_x=float(item.x),
                                         grab_y=0.0)
    # slide right by 2 (there is room: next item has transition 5)
    manip.set_sequence_item(seq, float(original_x + 2), 'add')
    assert seq[1].x == original_x + 2

    command = manip.finish()
    command.undo()
    assert seq[1].x == original_x


def test_sequence_item_group_extract_to_space():
    space = make_space()
    seq = make_sequence(x=0)
    space[0:0] = [seq]

    item = seq[1]
    manip = SequenceItemGroupManipulator([item], grab_x=float(item.x),
                                         grab_y=0.0)
    manip.set_space_item(space, 40.0, 2.0)
    assert len(seq) == 2
    assert len(space) == 2
    new_clip = next(i for i in space if isinstance(i, model.Clip))
    assert new_clip.x == 40
    assert new_clip.source.asset_path == 'green'

    command = manip.finish()
    command.undo()
    assert len(seq) == 3
    assert len(space) == 1


def test_sequence_manipulator_move():
    space = make_space()
    seq = make_sequence(x=10)
    space[0:0] = [seq]

    manip = SequenceManipulator(seq, grab_x=10.0, grab_y=0.0)
    manip.set_space_item(space, 25.0, 1.0)
    assert seq.x == 25
    command = manip.finish()
    command.undo()
    assert seq.x == 10


def test_item_manipulator_multiple():
    """ItemManipulator moves the primary and companions together; x is in
    seconds (rate=1 here so 1s == 1 frame)."""
    space = make_space()
    a = make_clip(x=0, y=0.0)
    b = make_clip(x=5, y=2.0)
    space[0:0] = [a, b]

    manip = ItemManipulator([a, b], grab_x=0.0, grab_y=0.0)
    manip.set_space_item(space, 10.0, 0.0)
    assert a.x == 10
    assert b.x == 15      # preserved relative offset

    command = manip.finish()
    command.undo()
    assert a.x == 0 and b.x == 5


def test_item_manipulator_moves_anchored():
    space = make_space()
    a = make_clip(x=0, y=0.0)
    b = make_clip(x=3, y=2.0)
    space[0:0] = [a, b]
    b.update(anchor=model.Anchor(target=a, offset_ns=3_000_000_000))
    b.anchor.y_offset = b.anchor.get_y_offset(b)

    manip = ItemManipulator([a], grab_x=0.0, grab_y=0.0)
    manip.set_space_item(space, 20.0, 0.0)
    assert a.x == 20
    # anchored follower keeps its 3-frame offset (rate=1)
    assert b.x == 23

    manip.finish()


def test_one_item_add_seq_full_walk():
    """Port of tests/canvas/ItemManipulator.py test_one_item_add_seq:
    drag one clip through every placement around/into a 2-item sequence,
    asserting positions, transitions, and NoRoomError at both crossings.
    """
    space = make_space()
    clip = model.Clip(x=0, y=0.0, height=20.0, length=15, offset=0,
                      type='video',
                      source=model.AssetStreamRef('red', 0))
    other = model.Clip(x=20, y=10.0, height=15.0, length=35, offset=10,
                       type='video',
                       source=model.AssetStreamRef('green', 0))
    seq = model.Sequence(x=10, y=10.0, type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           offset=1, length=10)])
    space[0:0] = [clip, other, seq]

    manip = ClipManipulator(clip, 0, 0.0)
    item = clip

    assert len(seq) == 2
    assert item.space is not None

    manip.set_sequence_item(seq, -6, 'add')      # before sequence
    assert seq.x == -6
    assert len(seq) == 3
    assert item.space is None
    assert seq[0].source.asset_path == 'red'
    assert seq[1].transition_length == -1

    manip.set_sequence_item(seq, -5, 'add')      # start, no overlap
    assert (seq.x, len(seq)) == (-5, 3)
    assert seq[1].transition_length == 0

    manip.set_sequence_item(seq, -4, 'add')      # start, 1-frame overlap
    assert (seq.x, len(seq)) == (-4, 3)
    assert seq[1].transition_length == 1

    manip.set_sequence_item(seq, 5, 'add')       # start, full overlap
    assert (seq.x, len(seq)) == (5, 3)
    assert seq[0].source.asset_path == 'red'
    assert seq[1].transition_length == 10

    with pytest.raises(model.NoRoomError):
        manip.set_sequence_item(seq, 6, 'add')   # would cross two transitions
    # failure backs everything out (clip neither in space nor sequence)
    assert (seq.x, len(seq)) == (10, 2)
    assert item.space is None
    assert seq[0].source.asset_path == 'seq1'
    assert seq[1].transition_length == 0

    with pytest.raises(model.NoRoomError):
        manip.set_sequence_item(seq, 9, 'add')
    assert (seq.x, len(seq)) == (10, 2)

    manip.set_sequence_item(seq, 10, 'add')      # across the middle cut
    assert len(seq) == 3
    assert [i.source.asset_path for i in seq] == ['seq1', 'red', 'seq2']
    assert seq[1].transition_length == 10
    assert seq[2].transition_length == 5

    manip.set_sequence_item(seq, 15, 'add')
    assert [i.source.asset_path for i in seq] == ['seq1', 'red', 'seq2']
    assert seq[1].transition_length == 5
    assert seq[2].transition_length == 10

    with pytest.raises(model.NoRoomError):
        manip.set_sequence_item(seq, 16, 'add')
    with pytest.raises(model.NoRoomError):
        manip.set_sequence_item(seq, 19, 'add')

    manip.set_sequence_item(seq, 20, 'add')      # end, full overlap
    assert [i.source.asset_path for i in seq] == ['seq1', 'seq2', 'red']
    assert [i.transition_length for i in seq] == [0, 0, 10]

    manip.set_sequence_item(seq, 29, 'add')      # end, 1-frame overlap
    assert [i.transition_length for i in seq] == [0, 0, 1]

    manip.set_sequence_item(seq, 20, 'add')
    assert [i.transition_length for i in seq] == [0, 0, 10]

    manip.set_sequence_item(seq, 30, 'add')      # end, no overlap
    assert [i.transition_length for i in seq] == [0, 0, 0]

    manip.set_sequence_item(seq, 31, 'add')      # after the sequence
    assert [i.transition_length for i in seq] == [0, 0, -1]

    command = manip.finish()
    assert command is not None


# --- ClipManipulator: gap / failure / reset walks (reference
# tests/canvas/ItemManipulator.py:245-712) ---------------------------------

def space_with_seq(clip_length=15, clip_offset=0, clip_type='video',
                   seq_type='video', tlen2=0, offset2=1):
    space = make_space()
    clip = model.Clip(x=0, y=0.0, height=20.0, length=clip_length,
                      offset=clip_offset, type=clip_type,
                      source=model.AssetStreamRef('red', 0))
    other = model.Clip(x=20, y=10.0, height=15.0, length=35, offset=10,
                       type='video',
                       source=model.AssetStreamRef('green', 0))
    seq = model.Sequence(x=10, y=10.0, type=seq_type, items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           offset=offset2, length=10,
                           transition_length=tlen2)])
    space[0:0] = [clip, other, seq]
    return space, clip, seq


def test_add_seq_into_gap():
    """Insert into the middle of a gap (negative transition_length):
    the following item keeps its absolute x via an adjusted transition."""
    space, clip, seq = space_with_seq(tlen2=-6)
    manip = ClipManipulator(clip, 0, 0.0)

    manip.set_sequence_item(seq, 20, 'add')
    assert seq.x == 10
    assert len(seq) == 3
    assert clip.space is None
    assert seq[1].source.asset_path == 'red'
    assert seq[1].transition_length == 0
    assert seq[1].x == 10
    assert seq[2].source.asset_path == 'seq2'
    assert seq[2].transition_length == 9
    assert seq[2].x == 16
    assert manip.finish() is not None


def test_add_seq_into_gap_short():
    """A short item at the start of a gap leaves a (smaller) gap."""
    space, clip, seq = space_with_seq(clip_length=3, tlen2=-6)
    manip = ClipManipulator(clip, 0, 0.0)

    manip.set_sequence_item(seq, 20, 'add')
    assert (seq.x, len(seq)) == (10, 3)
    assert seq[1].source.asset_path == 'red'
    assert seq[1].transition_length == 0
    assert seq[1].x == 10
    assert seq[2].transition_length == -3
    assert seq[2].x == 16
    assert manip.finish() is not None


def test_add_seq_anchor_retarget():
    """Anchors pointing at a clip retarget to the sequence item it becomes
    (and back on reset)."""
    space, clip, seq = space_with_seq(clip_length=3, tlen2=-6)
    other = space[1]
    other.update(anchor=model.Anchor(target=clip))

    manip = ClipManipulator(clip, 0, 0.0)
    manip.set_sequence_item(seq, 20, 'add')
    assert other.anchor.target is seq[1]

    manip.reset()
    assert other.anchor.target is clip


def test_add_seq_cross_transition_fails_everywhere():
    """A 3-frame clip cannot insert anywhere across an existing 5-frame
    transition; finish() after a dead placement raises."""
    space, clip, seq = space_with_seq(clip_length=3, tlen2=5)
    manip = ClipManipulator(clip, 0, 0.0)

    for x in range(11, 22):
        with pytest.raises(model.NoRoomError):
            manip.set_sequence_item(seq, x, 'add')

    with pytest.raises(RuntimeError):
        manip.finish()


def test_add_seq_overlap_existing_transition():
    """Full overlap at the start fails when the next cut already has a
    transition; state backs out and finish() raises."""
    space, clip, seq = space_with_seq(clip_length=15, tlen2=5)
    manip = ClipManipulator(clip, 0, 0.0)

    manip.set_sequence_item(seq, -6, 'add')
    assert (seq.x, len(seq)) == (-6, 3)
    assert seq[1].transition_length == -1
    manip.set_sequence_item(seq, -5, 'add')
    assert seq[1].transition_length == 0
    manip.set_sequence_item(seq, -4, 'add')
    assert seq[1].transition_length == 1

    with pytest.raises(model.NoRoomError):
        manip.set_sequence_item(seq, 5, 'add')
    assert (seq.x, len(seq)) == (10, 2)
    assert clip.space is None
    assert seq[0].source.asset_path == 'seq1'
    assert seq[1].transition_length == 5

    with pytest.raises(RuntimeError):
        manip.finish()


def test_add_seq_short_keeps_type_offset():
    """Inserted item carries the clip's offset and (non-video) type."""
    space, clip, seq = space_with_seq(clip_length=5, clip_offset=15,
                                      clip_type='noon', seq_type='noon')
    manip = ClipManipulator(clip, 0, 0.0)
    manip.set_sequence_item(seq, 4, 'add')
    assert (seq.x, len(seq)) == (4, 3)
    assert seq[0].source.asset_path == 'red'
    assert seq[1].transition_length == -1
    assert seq[0].offset == 15
    assert seq[0].type() == 'noon'


def test_add_seq_reset_from_various_spots():
    space, clip, seq = space_with_seq(clip_length=5)
    manip = ClipManipulator(clip, 0, 0.0)

    for x in (6, 16, 26):
        manip.set_sequence_item(seq, x, 'add')
        manip.reset()
        assert (len(seq), seq.x) == (2, 10)
        assert seq[0].x == 0 and seq[0].transition_length == 0
        assert seq[0].source.asset_path == 'seq1'
        assert seq[1].x == 10 and seq[1].transition_length == 0
        assert seq[1].source.asset_path == 'seq2'
        assert clip.space is not None


def test_fail_then_move_back_to_space():
    """After a NoRoomError the item can still be placed in the space."""
    space = make_space()
    clip = model.Clip(x=0, y=0.0, height=20.0, length=5, offset=0,
                      type='video', source=model.AssetStreamRef('red', 0))
    seq = model.Sequence(x=10, y=10.0, type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           offset=3, length=10, transition_length=3)])
    space[0:0] = [clip, seq]

    manip = ClipManipulator(clip, 0, 0.0)
    with pytest.raises(model.NoRoomError):
        manip.set_sequence_item(seq, 11, 'add')

    manip.set_space_item(space, 0, 0.0)
    assert clip.x == 0 and clip.y == 0.0
    assert clip.space is space


# --- SequenceItemGroupManipulator walks (reference
# tests/canvas/ItemManipulator.py:714-1296) --------------------------------

def two_item_seq():
    space = make_space()
    seq = model.Sequence(x=10, y=10.0, type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           offset=1, length=10)])
    space[0:0] = [seq]
    return space, seq


def seq_state(seq):
    return (seq.x, [(i.source.asset_path, i.x, i.transition_length)
                    for i in seq])


def test_seq_item_walk_first_item():
    """Slide the first item through gap/overlap/reorder positions."""
    space, seq = two_item_seq()
    manip = SequenceItemGroupManipulator([seq[0]], 10, 10.0)

    manip.set_sequence_item(seq, 10, 'add')      # no-op placement
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq2', 10, 0)])

    manip.set_sequence_item(seq, 5, 'add')       # left: gap opens
    assert seq_state(seq) == (5, [('seq1', 0, 0), ('seq2', 15, -5)])

    manip.set_sequence_item(seq, 15, 'add')      # right: transition forms
    assert seq_state(seq) == (15, [('seq1', 0, 0), ('seq2', 5, 5)])

    manip.set_sequence_item(seq, 25, 'add')      # past: items reorder
    assert seq_state(seq) == (20, [('seq2', 0, 0), ('seq1', 5, 5)])

    manip.set_sequence_item(seq, 35, 'add')      # far past: gap after
    assert seq_state(seq) == (20, [('seq2', 0, 0), ('seq1', 15, -5)])

    manip.reset()
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq2', 10, 0)])
    assert manip.finish() is None


def test_seq_item_walk_second_item():
    """Slide the second item, including reorder to the front."""
    space, seq = two_item_seq()
    manip = SequenceItemGroupManipulator([seq[1]], 20, 10.0)

    manip.set_sequence_item(seq, 20, 'add')
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq2', 10, 0)])

    manip.set_sequence_item(seq, 25, 'add')
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq2', 15, -5)])

    manip.set_sequence_item(seq, 15, 'add')
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq2', 5, 5)])

    manip.set_sequence_item(seq, 4, 'add')       # reorder to front
    assert seq_state(seq) == (4, [('seq2', 0, 0), ('seq1', 6, 4)])

    manip.set_sequence_item(seq, -5, 'add')
    assert seq_state(seq) == (-5, [('seq2', 0, 0), ('seq1', 15, -5)])

    manip.reset()
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq2', 10, 0)])
    assert manip.finish() is None


def test_seq_item_move_middle_gap_preserved():
    """Moving a middle item out and back must not grow an existing gap
    (reference 'weird case', ItemManipulator.py:798-831)."""
    space = make_space()
    clip = model.Clip(x=0, y=0.0, height=20.0, length=5, offset=0,
                      type='video', source=model.AssetStreamRef('red', 0))
    seq = model.Sequence(x=10, y=10.0, type='video', items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           offset=3, length=10, transition_length=3)])
    space[0:0] = [clip, seq]

    first = ClipManipulator(clip, 0, 0.0)
    first.set_sequence_item(seq, 35, 'add')
    first.finish()

    manip = SequenceItemGroupManipulator([seq[1]], 17, 0.0)
    assert (seq[1].x, seq[1].transition_length) == (7, 3)
    assert (seq[2].x, seq[2].transition_length) == (25, -8)

    manip.set_space_item(space, 0, 0.0)
    assert seq[1].x == 25          # remaining items closed up metadata-wise
    manip.set_sequence_item(seq, 17, 'add')
    assert (seq[1].x, seq[1].transition_length) == (7, 3)
    assert (seq[2].x, seq[2].transition_length) == (25, -8)

    manip.set_space_item(space, 0, 0.0)
    manip.set_sequence_item(seq, 18, 'add')
    assert (seq[1].x, seq[1].transition_length) == (8, 2)
    assert (seq[2].x, seq[2].transition_length) == (25, -7)


def offset_seq():
    """Sequence whose items carry distinct offsets/heights for checking
    clip manifestation."""
    space = make_space()
    seq = model.Sequence(x=10, y=10.0, type='video', height=3.0, items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=12, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           offset=21, length=10, transition_length=4)])
    space.append(seq)
    return space, seq


def test_seq_item_to_space_manifests_clip():
    space, seq = offset_seq()
    item = seq[0]
    manip = SequenceItemGroupManipulator([item], 10, 10.0)

    manip.set_space_item(space, 4, 19.0)
    assert len(seq) == 1
    assert seq.x == 16              # sequence shifts to keep seq2 put
    assert seq_state(seq) == (16, [('seq2', 0, 0)])
    assert len(space) == 2
    new_clip = space[0]
    assert isinstance(new_clip, model.Clip)
    assert (new_clip.x, new_clip.y) == (4, 19.0)
    assert new_clip.length == 10
    assert new_clip.height == 3.0
    assert new_clip.source.asset_path == 'seq1'
    assert new_clip.type() == 'video'
    assert new_clip.offset == 12

    manip.reset()
    assert len(seq) == 2 and len(space) == 1
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq2', 6, 4)])
    assert manip.finish() is None


def test_seq_item_to_space_incoming_anchor_follows():
    """An anchor pointing AT the moved sequence item retargets to the
    manifested clip, and back on reset/undo."""
    space, seq = offset_seq()
    item = seq[0]
    watcher = model.Clip(x=0, y=20.0, type='video', length=10, height=10.0,
                         source=model.AssetStreamRef('red', 0),
                         anchor=model.Anchor(target=item))
    space.insert(0, watcher)

    manip = SequenceItemGroupManipulator([item], 10, 10.0)
    manip.set_space_item(space, 4, 19.0)
    new_clip = space[1]
    assert isinstance(new_clip, model.Clip)
    assert new_clip.source.asset_path == 'seq1'
    assert new_clip.anchor is None
    assert watcher.anchor.target is new_clip

    manip.reset()
    assert watcher.anchor.target is seq[0]
    assert seq[0].anchor is None
    assert manip.finish() is None


def test_seq_item_to_space_incoming_anchor_undo():
    space, seq = offset_seq()
    item = seq[0]
    watcher = model.Clip(x=0, y=20.0, type='video', length=10, height=10.0,
                         source=model.AssetStreamRef('red', 0),
                         anchor=model.Anchor(target=item))
    space.insert(0, watcher)

    manip = SequenceItemGroupManipulator([item], 10, 10.0)
    manip.set_space_item(space, 4, 19.0)
    assert watcher.anchor.target is space[1]
    command = manip.finish()
    command.undo()
    assert len(seq) == 2 and len(space) == 2
    assert watcher.anchor.target is seq[0]
    assert seq[0].anchor is None


def test_seq_item_to_space_outgoing_anchor_kept():
    """The moved item's OWN anchor transfers onto the manifested clip and
    returns on reset."""
    space, seq = offset_seq()
    item = seq[0]
    target = model.Clip(x=0, y=20.0, type='video', length=10, height=10.0,
                        source=model.AssetStreamRef('red', 0))
    space.insert(0, target)
    item.update(anchor=model.Anchor(target=target,
                                    offset_ns=1_000_000_000 * 4))

    manip = SequenceItemGroupManipulator([item], 10, 10.0)
    manip.set_space_item(space, 4, 19.0)
    new_clip = space[1]
    assert new_clip.source.asset_path == 'seq1'
    assert new_clip.anchor is not None and new_clip.anchor.target is target
    assert target.anchor is None

    manip.reset()
    assert target.anchor is None
    assert seq[0].anchor.target is target
    assert manip.finish() is None


def test_seq_item_to_space_anchor_both_ways():
    space, seq = offset_seq()
    item = seq[0]
    target = model.Clip(x=0, y=20.0, type='video', length=10, height=10.0,
                        source=model.AssetStreamRef('red', 0),
                        anchor=model.Anchor(target=item))
    space.insert(0, target)
    item.update(anchor=model.Anchor(target=target,
                                    offset_ns=1_000_000_000 * 4))

    manip = SequenceItemGroupManipulator([item], 10, 10.0)
    manip.set_space_item(space, 4, 19.0)
    new_clip = space[1]
    assert new_clip.anchor.target is target
    assert target.anchor.target is new_clip

    manip.reset()
    assert target.anchor.target is seq[0]
    assert seq[0].anchor.target is target
    assert manip.finish() is None


def test_seq_items_to_space_manifest_sequence():
    """Moving MULTIPLE sequence items into space manifests a sequence."""
    space = make_space()
    seq = model.Sequence(x=10, y=10.0, type='video', height=3.0, items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=6, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq1.5', 0),
                           offset=13, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           offset=21, length=10, transition_length=4)])
    space.append(seq)

    manip = SequenceItemGroupManipulator(list(seq[0:2]), 10, 10.0)
    manip.set_space_item(space, 4, 19.0)
    assert len(seq) == 1
    assert seq.x == 26
    new_seq = space[0]
    assert isinstance(new_seq, model.Sequence)
    assert len(new_seq) == 2
    assert (new_seq.x, new_seq.y, new_seq.height) == (4, 19.0, 3.0)
    assert new_seq.type() == 'video'
    assert (new_seq[0].source.asset_path, new_seq[0].x,
            new_seq[0].offset) == ('seq1', 0, 6)
    assert (new_seq[1].source.asset_path, new_seq[1].x,
            new_seq[1].offset) == ('seq1.5', 10, 13)

    manip.reset()
    assert len(seq) == 3 and len(space) == 1
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq1.5', 10, 0),
                                   ('seq2', 16, 4)])
    assert manip.finish() is None


def test_seq_item_from_middle_leaves_gap():
    space = make_space()
    seq = model.Sequence(x=10, y=10.0, type='video', height=3.0, items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=12, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq1.5', 0),
                           offset=18, length=10, transition_length=0),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           offset=21, length=10, transition_length=4)])
    space.append(seq)
    manip = SequenceItemGroupManipulator([seq[1]], 20, 10.0)

    manip.set_space_item(space, 4, 19.0)
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq2', 16, -6)])
    new_clip = space[0]
    assert (new_clip.x, new_clip.y, new_clip.length) == (4, 19.0, 10)
    assert new_clip.source.asset_path == 'seq1.5'
    assert new_clip.offset == 18

    manip.reset()
    assert seq_state(seq) == (10, [('seq1', 0, 0), ('seq1.5', 10, 0),
                                   ('seq2', 16, 4)])
    assert manip.finish() is None


# --- ItemManipulator: rate-aware anchored moves (reference
# tests/canvas/ItemManipulator.py:1303-1480) -------------------------------

import fractions

ntsc_vid = plugins.VideoFormat(frame_rate=fractions.Fraction(24000, 1001))
aud48k = plugins.AudioFormat(sample_rate=48000)
FRAME_RATE = float(fractions.Fraction(24000, 1001))
SAMPLE_RATE = 48000.0


def ntsc_space():
    return model.Space('s', ntsc_vid, aud48k)


def test_move_anchored_videos_rates():
    space = ntsc_space()
    item0 = model.Clip(source=model.AssetStreamRef('red', 0), x=5, y=4.5,
                       offset=13, length=10, type='video')
    item1 = model.Clip(source=model.AssetStreamRef('blue', 0), x=2, y=17.3,
                       offset=13, length=10, type='video',
                       anchor=model.Anchor(target=item0))
    space[0:0] = [item0, item1]

    manip = ItemManipulator([item0], 7.0 / FRAME_RATE, 4.5)
    manip.set_space_item(space, 8.0 / FRAME_RATE, 4.5)
    assert (item0.x, item0.y) == (6, 4.5)
    assert (item1.x, item1.y) == (6, 17.3)

    manip.set_space_item(space, 9.3 / FRAME_RATE, 5.0)
    assert (item0.x, item0.y) == (7, 5.0)
    assert (item1.x, item1.y) == (7, 17.3 + 0.5)
    assert manip.finish() is not None


def test_move_anchored_audio_follows_video():
    """An anchored audio clip's x is in samples; it follows the video
    clip through the rate conversion."""
    space = ntsc_space()
    item0 = model.Clip(source=model.AssetStreamRef('red', 0), x=5, y=4.5,
                       offset=13, length=10, type='video')
    item1 = model.Clip(source=model.AssetStreamRef('blue', 0), x=2, y=17.3,
                       offset=13, length=10, type='audio',
                       anchor=model.Anchor(target=item0))
    space[0:0] = [item0, item1]

    manip = ItemManipulator([item0], 7.0 / FRAME_RATE, 4.5)
    manip.set_space_item(space, 8.0 / FRAME_RATE, 4.5)
    assert (item0.x, item0.y) == (6, 4.5)
    assert item1.x == round(6.0 * SAMPLE_RATE / FRAME_RATE)
    assert item1.y == 17.3

    manip.set_space_item(space, 9.3 / FRAME_RATE, 5.0)
    assert (item0.x, item0.y) == (7, 5.0)
    assert item1.x == round(7.0 * SAMPLE_RATE / FRAME_RATE)
    assert item1.y == 17.3 + 0.5
    assert manip.finish() is not None


def test_move_anchored_audio_video_two_way():
    space = ntsc_space()
    item0 = model.Clip(source=model.AssetStreamRef('red', 0), x=5, y=4.5,
                       offset=13, length=10, type='video')
    item1 = model.Clip(source=model.AssetStreamRef('blue', 0), x=2, y=17.3,
                       offset=13, length=10, type='audio',
                       anchor=model.Anchor(target=item0, two_way=True))
    space[0:0] = [item0, item1]

    manip = ItemManipulator([item0], 7.0 / FRAME_RATE, 4.5)
    manip.set_space_item(space, 8.0 / FRAME_RATE, 4.5)
    assert item0.x == 6
    assert item1.x == round(6.0 * SAMPLE_RATE / FRAME_RATE)
    assert manip.finish() is not None


def test_move_two_way_from_audio_side():
    """Grabbing the anchored (audio) side of a two-way anchor drags the
    video target along."""
    space = ntsc_space()
    item0 = model.Clip(source=model.AssetStreamRef('red', 0), x=5, y=4.5,
                       offset=13, length=10, type='video')
    item1 = model.Clip(source=model.AssetStreamRef('blue', 0), x=2, y=17.3,
                       offset=13, length=10, type='audio',
                       anchor=model.Anchor(target=item0, two_way=True))
    space[0:0] = [item0, item1]

    manip = ItemManipulator([item1], 0.0 / SAMPLE_RATE, 17.3)
    manip.set_space_item(space, 70000.0 / SAMPLE_RATE, 17.3)
    assert item1.x == 70002
    assert item1.y == 17.3
    assert item0.x == round(70000.0 * FRAME_RATE / SAMPLE_RATE)
    assert item0.y == 4.5
    assert manip.finish() is not None


def test_move_seq_and_its_item_deduplicates():
    """Selecting a sequence AND one of its items moves the sequence once
    (the contained item contributes nothing extra), in either order."""
    for order in ('seq_first', 'item_first'):
        space = ntsc_space()
        seq = model.Sequence(x=10, y=10.0, type='video', height=3.0, items=[
            model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                               offset=12, length=10),
            model.SequenceItem(source=model.AssetStreamRef('seq1.5', 0),
                               offset=18, length=10, transition_length=0),
            model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                               offset=21, length=10, transition_length=4)])
        space[0:0] = [seq]

        sel = [seq, seq[1]] if order == 'seq_first' else [seq[1], seq]
        manip = ItemManipulator(sel, 10.0 / FRAME_RATE, 10.0)

        manip.set_space_item(space, 12.0 / FRAME_RATE, 10.0)
        assert seq.x == 12
        assert seq[0].x == 0 and seq[1].x == 10

        manip.set_space_item(space, 8.0 / FRAME_RATE, 10.0)
        assert seq.x == 8
        assert seq[0].x == 0 and seq[1].x == 10
        assert manip.finish() is not None


def test_one_item_add_seq_backwards_walk():
    """The full placement walk in reverse order
    (ItemManipulator.py:353-461)."""
    space, clip, seq = space_with_seq(clip_length=15)
    manip = ClipManipulator(clip, 0, 0.0)

    manip.set_sequence_item(seq, 31, 'add')
    assert [i.source.asset_path for i in seq] == ['seq1', 'seq2', 'red']
    assert [i.transition_length for i in seq] == [0, 0, -1]

    manip.set_sequence_item(seq, 30, 'add')
    assert [i.transition_length for i in seq] == [0, 0, 0]

    manip.set_sequence_item(seq, 20, 'add')
    assert [i.transition_length for i in seq] == [0, 0, 10]

    manip.set_sequence_item(seq, 29, 'add')
    assert [i.transition_length for i in seq] == [0, 0, 1]

    manip.set_sequence_item(seq, 20, 'add')
    assert [i.transition_length for i in seq] == [0, 0, 10]

    manip.set_sequence_item(seq, 15, 'add')
    assert [i.source.asset_path for i in seq] == ['seq1', 'red', 'seq2']
    assert (seq[1].transition_length, seq[2].transition_length) == (5, 10)

    manip.set_sequence_item(seq, 10, 'add')
    assert seq.x == 10
    assert [i.source.asset_path for i in seq] == ['seq1', 'red', 'seq2']
    assert (seq[1].transition_length, seq[2].transition_length) == (10, 5)

    with pytest.raises(model.NoRoomError):
        manip.set_sequence_item(seq, 9, 'add')
    with pytest.raises(model.NoRoomError):
        manip.set_sequence_item(seq, 6, 'add')

    manip.set_sequence_item(seq, 5, 'add')
    assert (seq.x, seq[0].source.asset_path) == (5, 'red')
    assert seq[1].transition_length == 10

    manip.set_sequence_item(seq, -4, 'add')
    assert (seq.x, seq[1].transition_length) == (-4, 1)

    manip.set_sequence_item(seq, -5, 'add')
    assert (seq.x, seq[1].transition_length) == (-5, 0)

    manip.set_sequence_item(seq, -6, 'add')
    assert (seq.x, seq[1].transition_length) == (-6, -1)

    assert manip.finish() is not None


@pytest.mark.parametrize('seed', range(12))
def test_random_drag_gestures_undo_redo_roundtrip(seed):
    """Random drag gestures (space moves, sequence hovers, cancels,
    drops) leave the model consistent: undoing everything restores the
    initial snapshot, redoing restores the final one."""
    import numpy as np

    from canvas_tpu.editor import model, plugins
    from canvas_tpu.editor.model.undo import UndoStack
    from canvas_tpu.editor.ui.canvas_models import (CanvasSceneModel,
                                                    DragController)

    vf = plugins.VideoFormat(frame_rate=10)
    af = plugins.AudioFormat(sample_rate=48000)

    def snapshot(space):
        out = []
        for item in space:
            row = (type(item).__name__, item.x, item.y, item.length,
                   item.z)
            if isinstance(item, model.Sequence):
                row = row + tuple((si.x, si.length, si.offset,
                                   si.transition_length) for si in item)
            out.append(row)
        return sorted(out, key=str)

    rng = np.random.RandomState(9000 + seed)
    space = model.Space('s', vf, af)
    items = []
    for i in range(rng.randint(2, 6)):
        if rng.rand() < 0.3:
            seq_items = [model.SequenceItem(
                length=int(rng.randint(5, 20)), offset=0,
                transition_length=0)
                for _ in range(rng.randint(1, 4))]
            items.append(model.Sequence(
                type='video', x=int(rng.randint(0, 100)),
                y=float(rng.randint(0, 4)), height=1.0, items=seq_items))
        else:
            items.append(model.Clip(
                type='video', x=int(rng.randint(0, 100)),
                y=float(rng.randint(0, 4)),
                length=int(rng.randint(5, 30)), height=1.0))
    space[0:0] = items
    scene = CanvasSceneModel(space)
    stack = UndoStack()
    drag = DragController(scene, stack)
    base = snapshot(space)

    for _gesture in range(4):
        targets = [i for i in space]
        if not targets:
            break
        item = targets[rng.randint(len(targets))]
        drag.start(item, item.x / 10.0 + 0.1, item.y)
        for _ in range(rng.randint(1, 4)):
            if rng.rand() < 0.3:
                seqs = [s for s in space
                        if isinstance(s, model.Sequence) and s is not item]
                if seqs:
                    s = seqs[rng.randint(len(seqs))]
                    try:
                        drag.move_to_sequence(
                            s, float(rng.randint(0, 15)), s.y)
                    except Exception:
                        drag.move_to_space(float(rng.randint(0, 15)),
                                           float(rng.randint(0, 4)))
                    continue
            drag.move_to_space(float(rng.randint(0, 15)),
                               float(rng.randint(0, 4)))
        if rng.rand() < 0.25:
            drag.cancel()
        else:
            drag.drop()

    done = snapshot(space)
    while stack.can_undo():
        stack.undo()
    assert snapshot(space) == base
    while stack.can_redo():
        stack.redo()
    assert snapshot(space) == done


def test_item_manipulator_primary_in_own_group():
    """Grabbing one of several selected ADJACENT sequence items must
    include the grabbed item in its group manipulator: the old code
    removed the primary from the set first, so dragging moved only the
    siblings while the item under the cursor stayed put."""
    space = make_space()
    seq = make_sequence(x=0)
    space[0:0] = [seq]

    a, b = seq[0], seq[1]
    xs_before = (a.x, b.x)
    manip = ItemManipulator([b, a], grab_x=float(b.x), grab_y=0.0)
    manip.set_space_item(space, 50.0, 2.0)
    # BOTH items left the sequence together (a 2-item group extracts
    # as a new sequence in the space)
    assert len(seq) == 1
    extracted = [i for i in space
                 if i is not seq and i.type() == 'video']
    assert extracted and sum(
        len(i) if isinstance(i, model.Sequence) else 1
        for i in extracted) == 2
    command = manip.finish()
    command.undo()
    assert len(seq) == 3
    assert (seq[0].x, seq[1].x) == xs_before


def test_remove_nonadjacent_groups_round_trips():
    """Removing non-adjacent groups from a sequence must remove ALL of
    them and undo back to the original (ascending-order removal
    silently skipped later groups and duplicated items on undo)."""
    space = make_space()
    seq = model.Sequence(type='video', x=0, y=0.0, height=1.0, items=[
        model.SequenceItem(source=model.AssetStreamRef(n, 'video'),
                           offset=0, length=10)
        for n in ('red', 'green', 'blue', 'red', 'green')])
    space[0:0] = [seq]

    from canvas_tpu.editor.model.commands import \
        RemoveItemsFromSequenceCommand
    # remove indexes {0, 1, 3, 4}: two adjacency groups around 'blue'
    cmd = RemoveItemsFromSequenceCommand([seq[0], seq[1], seq[3], seq[4]])
    cmd.redo()
    assert len(seq) == 1
    assert seq[0].source.asset_path == 'blue'
    cmd.undo()
    assert [i.source.asset_path for i in seq] == \
        ['red', 'green', 'blue', 'red', 'green']


def test_undo_stack_clean_semantics():
    """QUndoStack semantics: no merging at the clean index, and
    clean_changed fires on every transition."""
    from canvas_tpu.editor.model.undo import UndoStack

    space = make_space()
    clip = make_clip()
    space[0:0] = [clip]

    from canvas_tpu.editor.model.commands import AdjustClipLengthCommand
    stack = UndoStack()
    events = []
    stack.clean_changed.connect(lambda v: events.append(v))

    stack.push(AdjustClipLengthCommand(clip, 2))
    stack.set_clean()
    assert stack.is_clean() and events[-1] is True
    stack.push(AdjustClipLengthCommand(clip, 3))   # same id: would merge
    assert not stack.is_clean(), 'merged into the saved-state command'
    assert events[-1] is False
    stack.undo()
    assert stack.is_clean() and events[-1] is True
    assert clip.length == 12                       # back AT the save point
    stack.redo()
    assert not stack.is_clean() and events[-1] is False
