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
