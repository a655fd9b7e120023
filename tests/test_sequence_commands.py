"""Sequence command semantics — port of
/root/reference/tests/canvas/SequenceCommands.py (the remove/add/move
battery with exact position/transition assertions)."""

import pytest

from canvas_tpu.editor import model


def ref(name):
    return model.AssetStreamRef(name, 0)


def seq3(x=10, trans2=0, trans3=0):
    return model.Sequence(x=x, y=10.0, items=[
        model.SequenceItem(source=ref('seq1'), offset=1, length=10),
        model.SequenceItem(source=ref('seq2'), offset=1, length=10,
                           transition_length=trans2),
        model.SequenceItem(source=ref('seq3'), offset=1, length=10,
                           transition_length=trans3)])


def names(sequence):
    return [item.source.asset_path for item in sequence]


def test_remove_single_from_start():
    sequence = seq3()
    command = model.RemoveAdjacentItemsFromSequenceCommand([sequence[0]])
    command.redo()
    assert len(sequence) == 2
    assert sequence.x == 20
    assert sequence[0].x == 0
    assert names(sequence) == ['seq2', 'seq3']

    command.undo()
    assert len(sequence) == 3
    assert sequence.x == 10
    assert [i.x for i in sequence] == [0, 10, 20]
    assert [i.transition_length for i in sequence] == [0, 0, 0]
    assert names(sequence) == ['seq1', 'seq2', 'seq3']


def test_remove_single_from_start_transition():
    sequence = seq3(trans2=3)
    command = model.RemoveAdjacentItemsFromSequenceCommand([sequence[0]])
    command.redo()
    assert len(sequence) == 2
    assert sequence.x == 17
    assert sequence.length == 20
    assert sequence[0].x == 0
    assert sequence[0].transition_length == 0
    assert names(sequence) == ['seq2', 'seq3']

    command.undo()
    assert sequence.x == 10
    assert sequence[1].transition_length == 3
    assert names(sequence) == ['seq1', 'seq2', 'seq3']


def test_remove_single_from_start_gap():
    sequence = seq3(trans2=-5)
    command = model.RemoveAdjacentItemsFromSequenceCommand([sequence[0]])
    command.redo()
    assert len(sequence) == 2
    assert sequence.x == 25
    assert sequence[0].transition_length == 0
    command.undo()
    assert sequence.x == 10
    assert sequence[1].transition_length == -5


@pytest.mark.parametrize('trans2,trans3', [(0, 0), (-3, -4), (5, 5)])
def test_remove_single_from_middle(trans2, trans3):
    sequence = seq3(trans2=trans2, trans3=trans3)
    command = model.RemoveAdjacentItemsFromSequenceCommand([sequence[1]])
    command.redo()
    assert len(sequence) == 2
    assert sequence.x == 10
    assert sequence[0].x == 0
    assert sequence[1].x == 20 - trans2 - trans3
    assert sequence[1].transition_length == -10 + trans2 + trans3
    assert names(sequence) == ['seq1', 'seq3']

    command.undo()
    assert len(sequence) == 3
    assert sequence.x == 10
    assert sequence[1].x == 10 - trans2
    assert sequence[1].transition_length == trans2
    assert sequence[2].transition_length == trans3
    assert names(sequence) == ['seq1', 'seq2', 'seq3']


@pytest.mark.parametrize('trans3', [0, -4, 4])
def test_remove_single_from_end(trans3):
    sequence = seq3(trans3=trans3)
    command = model.RemoveAdjacentItemsFromSequenceCommand([sequence[2]])
    command.redo()
    assert len(sequence) == 2
    assert sequence.x == 10
    assert sequence.length == 20
    assert [i.x for i in sequence] == [0, 10]
    assert names(sequence) == ['seq1', 'seq2']

    command.undo()
    assert len(sequence) == 3
    assert sequence.x == 10
    assert sequence[2].transition_length == trans3
    assert names(sequence) == ['seq1', 'seq2', 'seq3']


@pytest.mark.parametrize('trans2,trans3', [
    (0, 0), (3, 4), (3, -4), (-3, 4), (-3, -4)])
def test_remove_double_from_start(trans2, trans3):
    sequence = seq3(trans2=trans2, trans3=trans3)
    command = model.RemoveAdjacentItemsFromSequenceCommand(
        [sequence[0], sequence[1]])
    command.redo()
    assert len(sequence) == 1
    assert sequence.x == 30 - trans2 - trans3
    assert sequence.length == 10
    assert sequence[0].x == 0
    assert sequence[0].transition_length == 0
    assert names(sequence) == ['seq3']

    command.undo()
    assert len(sequence) == 3
    assert sequence.x == 10
    assert sequence[1].x == 10 - trans2
    assert sequence[1].transition_length == trans2
    assert sequence[2].x == 20 - trans2 - trans3
    assert sequence[2].transition_length == trans3


def make_space_with_sequence(**kw):
    from canvas_tpu.editor import plugins
    space = model.Space('s', plugins.VideoFormat(frame_rate=1),
                        plugins.AudioFormat(sample_rate=1))
    sequence = seq3(**kw)
    space[0:0] = [sequence]
    return space, sequence


@pytest.mark.parametrize('offset,trans3', [
    (0, -10), (5, -10), (-5, -10), (9, -10), (10, -10), (-9, -10),
    (-5, 0), (-3, -3)])
def test_add_single_to_middle(offset, trans3):
    """Add an item into a gap between two items
    (SequenceCommands.py:283-315)."""
    _add_single_to_middle(offset, trans3)


def _add_single_to_middle(offset, trans3):
    sequence = model.Sequence(x=10, y=10.0, items=[
        model.SequenceItem(source=ref('seq1'), offset=1, length=10),
        model.SequenceItem(source=ref('seq3'), transition_length=trans3,
                           offset=1, length=10)])
    mover = model.SequenceOverlapItemsMover([
        model.SequenceItem(source=ref('seq2'), offset=1, length=10)])

    command = model.AddOverlapItemsToSequenceCommand(sequence, mover,
                                                     20 + offset)
    command.redo()
    assert len(sequence) == 3
    assert sequence.x == 10
    assert sequence[1].x == 10 + offset
    assert sequence[2].x == 10 - trans3
    assert sequence[1].transition_length == -offset
    assert sequence[2].transition_length == 10 + offset + trans3
    assert names(sequence) == ['seq1', 'seq2', 'seq3']

    command.undo()
    assert len(sequence) == 2
    assert sequence.x == 10
    assert sequence[0].x == 0
    assert sequence[1].x == 10 - trans3
    assert sequence[1].transition_length == trans3
    assert names(sequence) == ['seq1', 'seq3']


def test_add_single_to_middle_no_room():
    with pytest.raises(model.NoRoomError):
        _add_single_to_middle(-3, 3)


@pytest.mark.parametrize('offset,trans2', [
    (0, 0), (-1, 0), (-6, 0), (-10, 0), (-14, 0),
    (-3, 3), (-4, 3), (-10, 3), (-14, 3)])  # reference offsets
def test_add_single_to_start(offset, trans2):
    """Add an item before the sequence start
    (SequenceCommands.py:316-364)."""
    _add_single_to_start(offset, trans2)


def _add_single_to_start(offset, trans2):
    # command x = 10 + offset; the new head becomes item 0 and the
    # sequence shifts to keep existing items in place
    sequence = model.Sequence(x=10, y=10.0, items=[
        model.SequenceItem(source=ref('seq2'), offset=1, length=10),
        model.SequenceItem(source=ref('seq3'), transition_length=trans2,
                           offset=1, length=10)])
    mover = model.SequenceOverlapItemsMover([
        model.SequenceItem(source=ref('seq1'), offset=1, length=10)])

    command = model.AddOverlapItemsToSequenceCommand(sequence, mover,
                                                     10 + offset)
    command.redo()
    assert len(sequence) == 3
    assert sequence.x == 10 + offset
    assert sequence[0].x == 0
    assert sequence[1].x == 0 - offset
    assert sequence[2].x == 10 - offset - trans2
    assert sequence[1].transition_length == 10 + offset
    assert sequence[2].transition_length == trans2
    assert names(sequence) == ['seq1', 'seq2', 'seq3']

    command.undo()
    assert len(sequence) == 2
    assert sequence.x == 10
    assert sequence[0].x == 0
    assert sequence[0].transition_length == 0
    assert sequence[1].x == 10 - trans2
    assert sequence[1].transition_length == trans2
    assert names(sequence) == ['seq2', 'seq3']


def test_add_single_to_start_no_room():
    with pytest.raises(model.NoRoomError):
        _add_single_to_start(-2, 3)


def test_add_single_to_end():
    """Append past the end (SequenceCommands.py:365-413)."""
    sequence = seq3()
    mover = model.SequenceOverlapItemsMover([
        model.SequenceItem(source=ref('new'), offset=0, length=5)])
    command = model.AddOverlapItemsToSequenceCommand(sequence, mover, 40)
    command.redo()
    assert names(sequence) == ['seq1', 'seq2', 'seq3', 'new']
    assert sequence.x + sequence[3].x == 40
    assert sequence[3].transition_length == 0    # flush with the end
    command.undo()
    assert names(sequence) == ['seq1', 'seq2', 'seq3']


def test_move_in_place_and_merge():
    """MoveSequenceOverlapItemsInPlaceCommand slides and merges
    (SequenceCommands.py:467-534)."""
    space, sequence = make_space_with_sequence()
    mover = model.SequenceOverlapItemsMover([sequence[1]])

    cmd1 = model.MoveSequenceOverlapItemsInPlaceCommand(mover, 3)
    cmd1.redo()
    assert sequence[1].x == 13
    assert sequence[1].transition_length == -3
    # third item keeps its absolute position
    assert sequence[2].x == 20

    cmd2 = model.MoveSequenceOverlapItemsInPlaceCommand(mover, -3)
    cmd2.redo()
    assert sequence[1].x == 10

    cmd1.mergeWith(cmd2)
    assert cmd1.offset == 0
    cmd1.undo()
    assert sequence[1].x == 10


def test_move_first_item_moves_sequence():
    space, sequence = make_space_with_sequence()
    mover = model.SequenceOverlapItemsMover([sequence[0]])
    command = model.MoveSequenceOverlapItemsInPlaceCommand(mover, 4)
    command.redo()
    assert sequence.x == 14
    # following item holds its scene position via transition_length
    assert sequence[1].transition_length == 4
    command.undo()
    assert sequence.x == 10
    assert sequence[1].transition_length == 0


def test_move_no_room_raises():
    space, sequence = make_space_with_sequence(trans2=5)
    mover = model.SequenceOverlapItemsMover([sequence[1]])
    command = model.MoveSequenceOverlapItemsInPlaceCommand(mover, 50)
    with pytest.raises(model.NoRoomError):
        command.redo()


def test_to_item_round_trip():
    """SequenceItemsMover.to_item -> Sequence rebuild keeps geometry
    (SequenceCommands.py:641-672)."""
    sequence = seq3(trans2=3)
    mover = model.SequenceItemsMover([sequence[0], sequence[1],
                                      sequence[2]])
    item = mover.to_item(height=2.0, x=100, y=5.0)
    assert isinstance(item, model.Sequence)
    assert item.x == 100
    assert item.length == sequence.length
    assert [i.transition_length for i in item] == \
        [i.transition_length for i in sequence]


# --- remaining reference walks (SequenceCommands.py:414-710) ---------------

def _add_double_to_middle(offset, seq3_trans=-10):
    sequence = model.Sequence(x=10, y=10.0, items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq3', 0),
                           transition_length=seq3_trans, offset=1,
                           length=10)])
    items = [
        model.SequenceItem(source=model.AssetStreamRef('seq2a', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2b', 0),
                           transition_length=5, offset=1, length=10)]
    mover = model.SequenceOverlapItemsMover(items)
    command = model.AddOverlapItemsToSequenceCommand(sequence, mover,
                                                     20 + offset)
    command.redo()

    assert len(sequence) == 4
    assert sequence.x == 10
    assert sequence[1].transition_length == -offset
    assert sequence[1].x == 10 + offset
    assert sequence[2].transition_length == 5
    assert sequence[2].x == 10 + offset + 5
    assert sequence[3].transition_length == 15 + offset + seq3_trans
    assert sequence[3].x == 10 - seq3_trans
    assert [i.source.asset_path for i in sequence] == \
        ['seq1', 'seq2a', 'seq2b', 'seq3']

    command.undo()
    assert len(sequence) == 2
    assert (sequence.x, sequence[0].x, sequence[0].transition_length) == \
        (10, 0, 0)
    assert (sequence[1].x, sequence[1].transition_length) == \
        (10 - seq3_trans, seq3_trans)


def test_add_double_to_middle():
    _add_double_to_middle(0)
    _add_double_to_middle(-5)
    with pytest.raises(model.NoRoomError):
        _add_double_to_middle(-6)    # transition runs into seq1
    with pytest.raises(model.NoRoomError):
        _add_double_to_middle(1)     # transition runs into seq3


def _move_single_at_middle(offset, seq2_trans=0, seq5_trans=0):
    sequence = model.Sequence(x=10, y=10.0, items=[
        model.SequenceItem(source=model.AssetStreamRef('seq%d' % i, 0),
                           offset=1, length=10,
                           transition_length=(
                               seq2_trans if i == 2 else
                               seq5_trans if i == 5 else 0))
        for i in range(1, 6)])
    mover = model.SequenceOverlapItemsMover([sequence[2]])
    command = model.MoveSequenceOverlapItemsInPlaceCommand(mover, offset)
    try:
        command.redo()
        assert (len(sequence), sequence.x) == (5, 10)
        assert sequence[1].transition_length == seq2_trans
        assert sequence[1].x == 10 - seq2_trans
        assert sequence[2].transition_length == -offset
        assert sequence[2].x == 20 + offset - seq2_trans
        assert sequence[3].transition_length == offset
        assert sequence[3].x == 30 - seq2_trans
        assert sequence[4].transition_length == seq5_trans
        assert sequence[4].x == 40 - seq2_trans - seq5_trans
        command.undo()
    finally:
        assert (len(sequence), sequence.x) == (5, 10)
        assert sequence[2].transition_length == 0
        assert sequence[2].x == 20 - seq2_trans
        assert sequence[3].transition_length == 0
        assert sequence[3].x == 30 - seq2_trans


def test_move_single_at_middle_walk():
    for args in [(0,), (-5,), (-5, 5, 5), (-10,), (5,), (5, 5, 5), (10,)]:
        _move_single_at_middle(*args)
    with pytest.raises(model.NoRoomError):
        _move_single_at_middle(-11)          # past the beginning of seq2
    with pytest.raises(model.NoRoomError):
        _move_single_at_middle(-10, seq2_trans=1)   # into seq1 transition
    with pytest.raises(model.NoRoomError):
        _move_single_at_middle(11)           # past the end of seq4
    with pytest.raises(model.NoRoomError):
        _move_single_at_middle(10, seq5_trans=1)    # into seq5 transition


def _move_single_at_start(offset, seq2_trans=0, seq3_trans=0):
    sequence = model.Sequence(x=10, y=10.0, items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           transition_length=seq2_trans, offset=1,
                           length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq3', 0),
                           transition_length=seq3_trans, offset=1,
                           length=10)])
    mover = model.SequenceOverlapItemsMover([sequence[0]])
    command = model.MoveSequenceOverlapItemsInPlaceCommand(mover, offset)
    try:
        command.redo()
        assert (len(sequence), sequence.x) == (3, 10 + offset)
        assert sequence[1].transition_length == seq2_trans + offset
        assert sequence[1].x == 10 - seq2_trans - offset
        assert sequence[2].transition_length == seq3_trans
        assert sequence[2].x == 20 - seq2_trans - seq3_trans - offset
        command.undo()
    finally:
        assert (len(sequence), sequence.x) == (3, 10)
        assert sequence[1].transition_length == seq2_trans
        assert sequence[1].x == 10 - seq2_trans


def test_move_single_at_start_walk():
    for offset in (0, 5, 10, -5, -10, -15):
        _move_single_at_start(offset)
    with pytest.raises(model.NoRoomError):
        _move_single_at_start(11)            # past the end of seq2
    _move_single_at_start(5, seq3_trans=5)
    with pytest.raises(model.NoRoomError):
        _move_single_at_start(6, seq3_trans=5)   # bumps into seq3 transition


def test_combine_commands():
    """mergeWith composes two in-place moves into one undo step."""
    sequence = model.Sequence(x=10, y=10.0, items=[
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           offset=1, length=10),
        model.SequenceItem(source=model.AssetStreamRef('seq3', 0),
                           offset=1, length=10)])
    mover = model.SequenceOverlapItemsMover([sequence[0]])

    command1 = model.MoveSequenceOverlapItemsInPlaceCommand(mover, 1)
    command1.redo()
    assert sequence.x == 11
    assert sequence[1].transition_length == 1

    command2 = model.MoveSequenceOverlapItemsInPlaceCommand(mover, -2)
    command2.redo()
    assert sequence.x == 9
    assert sequence[1].transition_length == -1

    command1.mergeWith(command2)
    command1.undo()
    assert sequence.x == 10
    assert sequence[1].transition_length == 0
    assert sequence[1].x == 10

    command1.redo()
    assert sequence.x == 9
    assert sequence[1].transition_length == -1
    assert sequence[1].x == 11


@pytest.mark.parametrize('seq2_trans,seq3_trans',
                         [(0, 0), (-5, -6), (5, -6), (5, 6)])
def test_items_mover_to_item(seq2_trans, seq3_trans):
    items = [
        model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                           offset=1, length=6),
        model.SequenceItem(source=model.AssetStreamRef('seq2', 0),
                           transition_length=seq2_trans, offset=2,
                           length=19),
        model.SequenceItem(source=model.AssetStreamRef('seq3', 0),
                           transition_length=seq3_trans, offset=5,
                           length=10)]
    mover = model.SequenceItemsMover(items)
    seq = mover.to_item(height=4.5)
    assert seq.height == 4.5
    assert len(seq) == 3
    assert [i.source.asset_path for i in seq] == ['seq1', 'seq2', 'seq3']
    assert [i.offset for i in seq] == [1, 2, 5]
    assert [i.transition_length for i in seq] == [0, seq2_trans, seq3_trans]
    assert [i.length for i in seq] == [6, 19, 10]


def test_slide_two_around():
    for offsets, die_on in ([(0, -1, -2, -6, 15)], None), \
                           ([(0, -1, -2, -6, 15, 30)], 5):
        offsets = offsets[0]
        sequence = model.Sequence(x=10, y=10.0, items=[
            model.SequenceItem(source=model.AssetStreamRef('seq1', 0),
                               offset=1, length=10),
            model.SequenceItem(source=model.AssetStreamRef('seq2a', 0),
                               offset=1, length=10),
            model.SequenceItem(source=model.AssetStreamRef('seq2b', 0),
                               offset=1, length=10),
            model.SequenceItem(source=model.AssetStreamRef('seq3', 0),
                               offset=1, length=10)])
        mover = model.SequenceItemsMover([sequence[1], sequence[2]])
        current = 0
        for i, offset in enumerate(offsets):
            command = model.MoveSequenceItemsInPlaceCommand(mover, offset)
            if die_on == i:
                with pytest.raises(model.NoRoomError):
                    command.redo()
            else:
                command.redo()
                current += offset
            assert len(sequence) == 4
            assert [it.source.asset_path for it in sequence] == \
                ['seq1', 'seq2a', 'seq2b', 'seq3']
            assert sequence[0].x == 0
            assert sequence[1].x == 10 + current
            assert sequence[2].x == 20 + current
            assert sequence[3].x == 30


# --- AdjustSequenceItemStart/LengthCommand (commands.py:822-946) ---


def test_adjust_start_middle_eats_transition():
    """Start trim of a middle item: offset moves into the media
    (offset+, length-) and the transition to the PREVIOUS item
    shrinks by the same amount; x of everything else is untouched."""
    sequence = seq3(trans2=3)
    item = sequence[1]
    command = model.AdjustSequenceItemStartCommand(item, 2)
    command.redo()
    assert (item.offset, item.length, item.transition_length) == (3, 8, 1)
    assert sequence.x == 10
    command.undo()
    assert (item.offset, item.length, item.transition_length) == (1, 10, 3)


def test_adjust_start_first_item_moves_sequence():
    """Trimming the FIRST item's start slides the whole sequence so
    later items keep their absolute positions."""
    sequence = seq3()
    item = sequence[0]
    command = model.AdjustSequenceItemStartCommand(item, 4)
    command.redo()
    assert (item.offset, item.length) == (5, 6)
    assert item.transition_length == 0
    assert sequence.x == 14
    command.undo()
    assert (item.offset, item.length) == (1, 10)
    assert sequence.x == 10


def test_adjust_start_merge_accumulates():
    """Drag gestures merge successive commands into one undo entry."""
    sequence = seq3()
    item = sequence[0]
    c1 = model.AdjustSequenceItemStartCommand(item, 2)
    c1.redo()
    c2 = model.AdjustSequenceItemStartCommand(item, 3)
    c2.redo()
    assert c1.mergeWith(c2)
    assert c1.offset == 5
    assert sequence.x == 15
    c1.undo()
    assert (item.offset, item.length) == (1, 10)
    assert sequence.x == 10


def test_adjust_start_merge_rejects_other_item():
    sequence = seq3()
    c1 = model.AdjustSequenceItemStartCommand(sequence[1], 1)
    c2 = model.AdjustSequenceItemStartCommand(sequence[2], 1)
    assert not c1.mergeWith(c2)
    c3 = model.AdjustSequenceItemLengthCommand(sequence[1], 1)
    assert not c1.mergeWith(c3)


def test_adjust_start_no_room():
    sequence = seq3(trans2=3)
    # length would hit zero
    with pytest.raises(model.NoRoomError):
        model.AdjustSequenceItemStartCommand(sequence[0], 10)
    # extending start (negative offset) grows the transition past the
    # room left in the previous item
    with pytest.raises(model.NoRoomError):
        model.AdjustSequenceItemStartCommand(sequence[1], -8)
    # moving the start past the start of the next item's transition
    sequence2 = seq3(trans3=4)
    with pytest.raises(model.NoRoomError):
        model.AdjustSequenceItemStartCommand(sequence2[1], 7)
    # detached item
    with pytest.raises(RuntimeError):
        model.AdjustSequenceItemStartCommand(
            model.SequenceItem(source=ref('x'), offset=0, length=5), 1)


def test_adjust_length_grows_next_transition():
    """Length trim keeps neighbors in place: the NEXT item's
    transition absorbs the change."""
    sequence = seq3(trans3=2)
    item = sequence[1]
    command = model.AdjustSequenceItemLengthCommand(item, 3)
    command.redo()
    assert item.length == 13
    assert sequence[2].transition_length == 5
    command.undo()
    assert item.length == 10
    assert sequence[2].transition_length == 2


def test_adjust_length_last_item_no_next():
    sequence = seq3()
    item = sequence[2]
    command = model.AdjustSequenceItemLengthCommand(item, -4)
    command.redo()
    assert item.length == 6
    command.undo()
    assert item.length == 10


def test_adjust_length_merge_accumulates():
    sequence = seq3(trans3=1)
    item = sequence[1]
    c1 = model.AdjustSequenceItemLengthCommand(item, 2)
    c1.redo()
    c2 = model.AdjustSequenceItemLengthCommand(item, 1)
    c2.redo()
    assert c1.mergeWith(c2)
    assert c1.offset == 3
    assert (item.length, sequence[2].transition_length) == (13, 4)
    c1.undo()
    assert (item.length, sequence[2].transition_length) == (10, 1)


def test_adjust_length_no_room():
    sequence = seq3()
    with pytest.raises(model.NoRoomError):
        model.AdjustSequenceItemLengthCommand(sequence[0], -10)
    # growing the next item's transition past its room
    with pytest.raises(model.NoRoomError):
        model.AdjustSequenceItemLengthCommand(sequence[1], 11)
    with pytest.raises(RuntimeError):
        model.AdjustSequenceItemLengthCommand(
            model.SequenceItem(source=ref('x'), offset=0, length=5), 1)
