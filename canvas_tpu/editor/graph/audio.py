"""Audio graph manager: Space -> process.AudioWorkspace.

Behavioral rebuild of /root/reference/fluggo/editor/graph/audio.py:23-103.
"""

from canvas_tpu import process
from canvas_tpu.editor import plugins
from canvas_tpu.editor.model import items as model_items
from canvas_tpu.editor.model.connectors import AudioSourceRefConnector

__all__ = ['SpaceAudioManager']


class SpaceAudioManager(plugins.AudioStream):
    class ItemWatcher:
        def __init__(self, owner, canvas_item, workspace_item, stream):
            self.owner = owner
            self.canvas_item = canvas_item
            self.workspace_item = workspace_item
            self.canvas_item.updated.connect(self.handle_updated)
            self.stream = stream

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

                if old_x != new_x:
                    self.owner.frames_updated(min(old_x, new_x),
                                              max(old_x, new_x) - 1)
                if old_right != new_right:
                    self.owner.frames_updated(min(old_right, new_right),
                                              max(old_right, new_right) - 1)
                if old_x - old_offset != new_x - new_offset:
                    self.owner.frames_updated(max(old_x, new_x),
                                              min(old_right, new_right) - 1)

        def unwatch(self):
            self.canvas_item.updated.disconnect(self.handle_updated)

    def __init__(self, canvas_space, source_list):
        self.workspace = process.AudioWorkspace()
        plugins.AudioStream.__init__(self, self.workspace,
                                     canvas_space.audio_format)

        self.canvas_space = canvas_space
        self.canvas_space.item_added.connect(self.handle_item_added)
        self.canvas_space.item_removed.connect(self.handle_item_removed)
        self.source_list = source_list
        self.watchers = {}

        for item in canvas_space:
            if item.type() == 'audio':
                self.handle_item_added(item)

    def handle_item_added(self, item):
        if not isinstance(item, model_items.Item):
            return
        if item.type() != 'audio':
            return

        stream = None
        offset = 0
        if isinstance(item, model_items.Sequence):
            raise NotImplementedError('Need a SequenceAudioManager here')
        elif hasattr(item, 'source'):
            stream = AudioSourceRefConnector(self.source_list, item.source,
                                             model_obj=item)
            offset = item.offset

        self.follow_alerts(stream)
        workspace_item = self.workspace.add(x=item.x, length=item.length,
                                            offset=offset, source=stream)
        watcher = self.ItemWatcher(self, item, workspace_item, stream)
        self.watchers[id(item)] = watcher

    def handle_item_removed(self, item):
        if item.type() != 'audio':
            return
        watcher = self.watchers.pop(id(item))
        watcher.unwatch()
        self.unfollow_alerts(watcher.stream)
        self.workspace.remove(watcher.workspace_item)
