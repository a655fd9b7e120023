"""Video graph managers: compile Space/Sequence models into the engine.

Behavioral rebuild of /root/reference/fluggo/editor/graph/video.py:

* :class:`SpaceVideoManager` (:32-130) mirrors a Space into a
  process.VideoWorkspace; per-item watchers translate model edits into
  workspace updates + ``frames_updated`` dirty ranges, and keep z-order
  in sync with the y/z sort.
* :class:`SequenceVideoManager` (:132-293) compiles a Sequence into a
  process.VideoSequence whose per-clip streams each mix in the *next*
  clip's transition via an AnimationFunc-driven VideoMixFilter.
"""

from canvas_tpu import process, sortlist
from canvas_tpu.editor import plugins
from canvas_tpu.editor.model import items as model_items
from canvas_tpu.editor.model.connectors import VideoSourceRefConnector

__all__ = ['SpaceVideoManager', 'SequenceVideoManager']


class SpaceVideoManager(plugins.VideoStream):
    class ItemWatcher:
        def __init__(self, owner, canvas_item, workspace_item, stream):
            self.owner = owner
            self.canvas_item = canvas_item
            self.workspace_item = workspace_item
            self.canvas_item.updated.connect(self.handle_updated)
            self.stream = stream
            self._z_order = 0

        def handle_updated(self, **kw):
            if 'x' in kw or 'length' in kw or 'offset' in kw:
                old_x = self.workspace_item.x
                old_length = self.workspace_item.length
                old_offset = self.workspace_item.offset
                new_x = kw.get('x', old_x)
                new_length = kw.get('length', old_length)
                new_offset = kw.get('offset', old_offset)
                old_right = old_x + old_length
                new_right = new_x + new_length

                self.workspace_item.update(x=new_x, length=new_length,
                                           offset=new_offset)

                # Dirty ranges: leading edge, trailing edge, and content
                # shift (graph/video.py:56-64)
                if old_x != new_x:
                    self.owner.frames_updated(min(old_x, new_x),
                                              max(old_x, new_x) - 1)
                if old_right != new_right:
                    self.owner.frames_updated(min(old_right, new_right),
                                              max(old_right, new_right) - 1)
                if old_x - old_offset != new_x - new_offset:
                    self.owner.frames_updated(max(old_x, new_x),
                                              min(old_right, new_right) - 1)

            if 'y' in kw or 'z' in kw:
                self.owner.watchers_sorted.move(self.z_order)

        @property
        def z_order(self):
            return self._z_order

        @z_order.setter
        def z_order(self, value):
            self._z_order = value
            if value != self.workspace_item.z:
                self.workspace_item.update(z=value)
                self.owner.frames_updated(
                    self.workspace_item.x,
                    self.workspace_item.x + self.workspace_item.length - 1)

        def unwatch(self):
            self.canvas_item.updated.disconnect(self.handle_updated)

    def __init__(self, canvas_space, source_list):
        self.workspace = process.VideoWorkspace()
        plugins.VideoStream.__init__(self, self.workspace,
                                     canvas_space.video_format)

        self.canvas_space = canvas_space
        self.canvas_space.item_added.connect(self.handle_item_added)
        self.canvas_space.item_removed.connect(self.handle_item_removed)
        self.source_list = source_list
        self.watchers = {}
        self.watchers_sorted = sortlist.SortedList(
            keyfunc=lambda a: a.canvas_item.z_sort_key(),
            index_attr='z_order')

        for item in canvas_space:
            if item.type() == 'video':
                self.handle_item_added(item)

    def handle_item_added(self, item):
        if not isinstance(item, model_items.Item):
            return
        if item.type() != 'video':
            return

        stream = None
        offset = 0
        if isinstance(item, model_items.Sequence):
            stream = SequenceVideoManager(item, self.source_list, self.format)
        elif hasattr(item, 'source'):
            stream = VideoSourceRefConnector(self.source_list, item.source,
                                             model_obj=item)
            offset = item.offset

        self.follow_alerts(stream)
        workspace_item = self.workspace.add(x=item.x, length=item.length,
                                            z=item.z, offset=offset,
                                            source=stream)
        watcher = self.ItemWatcher(self, item, workspace_item, stream)
        self.watchers[id(item)] = watcher
        self.watchers_sorted.add(watcher)

    def handle_item_removed(self, item):
        if item.type() != 'video':
            return
        watcher = self.watchers.pop(id(item))
        watcher.unwatch()
        self.unfollow_alerts(watcher.stream)
        self.watchers_sorted.remove(watcher)
        self.workspace.remove(watcher.workspace_item)


class SequenceVideoManager(plugins.VideoStream):
    class ItemWatcher(plugins.VideoStream):
        """Video for one sequence clip: includes its *out* transition
        (mix to the next clip) and any gap before it
        (graph/video.py:133-163)."""

        def __init__(self, owner, seq, seq_item):
            self.owner = owner
            self.seq = seq
            self.seq_item = seq_item
            self.connector = VideoSourceRefConnector(
                owner.source_list, ref=seq_item.source, model_obj=seq_item)

            # A = this clip; B = the next clip, faded in by mix_b
            self.source_a = process.VideoPassThroughFilter(self.connector,
                                                           start_frame=0)
            self.gap_proxy = process.VideoPassThroughFilter(self.source_a)
            self.source_b = process.VideoPassThroughFilter(None)

            # Transition curve: hold A until fade_point, lerp to B by
            # out_point (graph/video.py:151-157)
            self.mix_b = process.AnimationFunc()
            self.mix_b.add(process.POINT_HOLD, -1.0, 0.0)
            self.fade_point = self.mix_b.add(process.POINT_LINEAR, 0.0, 0.0)
            self.out_point = self.mix_b.add(process.POINT_HOLD, 0.0, 1.0)

            self.mix_filter = process.VideoMixFilter(
                self.gap_proxy, self.source_b, self.mix_b)
            plugins.VideoStream.__init__(self, self.mix_filter)
            self.follow_alerts(self.connector)

    def __init__(self, sequence, source_list, format):
        self.seqfilter = process.VideoSequence()
        plugins.VideoStream.__init__(self, self.seqfilter, format)

        self.sequence = sequence
        self.source_list = source_list
        self.sequence.item_added.connect(self._handle_item_added)
        self.sequence.items_removed.connect(self._handle_items_removed)
        self.sequence.item_updated.connect(self._handle_item_updated)
        self.watchers = []

        for item in self.sequence:
            self._handle_item_added(item)

    def unwatch(self):
        self.sequence.item_added.disconnect(self._handle_item_added)
        self.sequence.items_removed.disconnect(self._handle_items_removed)
        self.sequence.item_updated.disconnect(self._handle_item_updated)

    def _handle_item_added(self, item):
        watcher = self.ItemWatcher(self, self.sequence, item)
        self.follow_alerts(watcher)
        self.watchers.insert(item.index, watcher)
        self.seqfilter.insert(item.index, (watcher, 0, item.length))

        self._handle_item_updated(item, offset=item.offset,
                                  source=item.source, length=item.length,
                                  transition_length=item.transition_length)

        watcher = self.watchers[item.index]
        next_watcher = (item.index + 1 < len(self.watchers) and
                        self.watchers[item.index + 1])
        if next_watcher:
            watcher.source_b.set_source(next_watcher.connector)

    def _handle_items_removed(self, start, stop):
        start_frame = self.watchers[start].seq_item.x
        end_frame = (self.seqfilter.get_start_frame(len(self.seqfilter) - 1) +
                     self.seqfilter[-1][2] - 1)

        for watcher in self.watchers[start:stop]:
            self.unfollow_alerts(watcher)
        del self.watchers[start:stop]
        for i in range(stop - 1, start - 1, -1):
            del self.seqfilter[i]

        if start < len(self.watchers):
            item = self.watchers[start].seq_item
            self._handle_item_updated(
                item, transition_length=item.transition_length)
        elif self.watchers:
            watcher = self.watchers[-1]
            item = watcher.seq_item
            watcher.source_b.set_source(None)
            watcher.fade_point.frame = item.length - item.transition_length

        self.frames_updated(start_frame, end_frame)

    def _handle_item_updated(self, item, **kw):
        if frozenset(('offset', 'source', 'transition_length',
                      'length')).isdisjoint(kw.keys()):
            return

        watcher = self.watchers[item.index]
        prev_watcher = item.index > 0 and self.watchers[item.index - 1]
        prev_item = prev_watcher and prev_watcher.seq_item
        next_watcher = (item.index + 1 < len(self.watchers) and
                        self.watchers[item.index + 1])
        next_item = next_watcher and next_watcher.seq_item

        start_frame = item.x + item.transition_length
        length = item.length - item.transition_length
        mid_width = length

        if next_item:
            mid_width -= next_item.transition_length
            watcher.source_b.offset = next_item.offset - mid_width
            watcher.source_b.set_source(next_watcher.connector)

        if prev_item:
            prev_length = prev_item.length - prev_item.transition_length
            prev_watcher.source_b.offset = item.offset - (
                prev_length - item.transition_length)
            prev_watcher.source_b.set_source(watcher.connector)

        watcher.source_a.offset = item.offset + max(0, item.transition_length)
        # A gap before the clip is produced by offsetting the gap proxy
        watcher.gap_proxy.offset = min(0, item.transition_length)

        if 'offset' in kw:
            self.frames_updated(start_frame - item.transition_length,
                                start_frame + length - 1)

        if 'source' in kw:
            watcher.connector.set_ref(item.source)
            self.frames_updated(start_frame - item.transition_length,
                                start_frame + length - 1)

        if 'transition_length' in kw or 'length' in kw:
            old_fade_point = int(round(watcher.fade_point.frame))
            old_length = int(round(watcher.out_point.frame))

            watcher.out_point.frame = length
            watcher.fade_point.frame = mid_width

            if 'transition_length' in kw and prev_item:
                old_trans_length = int(round(prev_watcher.out_point.frame -
                                             prev_watcher.fade_point.frame))
                prev_watcher.out_point.frame = prev_length
                prev_watcher.fade_point.frame = prev_length - max(
                    item.transition_length, 0)
                self.frames_updated(
                    start_frame - item.transition_length -
                    max(old_trans_length - item.transition_length, 0),
                    self.sequence.length + max(0, old_length - length) - 1)
            else:
                self.frames_updated(
                    start_frame + min(old_fade_point, mid_width),
                    self.sequence.length + max(0, old_length - length) - 1)

            self.seqfilter[item.index] = (watcher, 0, length)
