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
