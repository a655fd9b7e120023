"""Assets, plugin-backed sources, and projects.

Behavioral rebuild of /root/reference/fluggo/editor/model/sources.py:
Asset (:31-86), _SpaceSource/SpaceAsset (:88-182), PluginSource/
PluginSourceAsset (:233-388), RuntimeSource/RuntimeSourceAsset
(:389-419), AssetStreamRef (:421-456), AssetList (:458-506), Project
(:508-533), with YAML tags.
"""

from collections.abc import MutableMapping

import yaml

from canvas_tpu import logging as _logging
from canvas_tpu.editor import plugins
from canvas_tpu.signal import Signal

_log = _logging.getLogger(__name__)

__all__ = ['Asset', 'SpaceAsset', 'PluginSource', 'PluginSourceAsset',
           'RuntimeSource', 'RuntimeSourceAsset', 'AssetStreamRef',
           'AssetList', 'Project']


class Asset:
    yaml_tag = '!Asset'

    #: True if the asset can be used as a source.
    is_source = False
    #: True if the editor can open a composition editor for this asset.
    is_composition = False
    #: True if this asset can contain other assets.
    contains_assets = False

    def __init__(self, name, keywords=()):
        self.name = name
        self._keywords = frozenset(keywords)
        self.keywords_updated = Signal()
        self._asset_list = None

    def get_source(self):
        return None

    def create_composition_editor(self):
        raise NotImplementedError

    def get_definition(self):
        return {'keywords': list(self._keywords)}

    asset_list = property(lambda self: self._asset_list)

    @property
    def path(self):
        return self.name

    keywords = property(lambda self: self._keywords)

    def fixup(self):
        pass

    @classmethod
    def to_yaml(cls, dumper, data):
        return dumper.represent_mapping(cls.yaml_tag, data.get_definition())

    @classmethod
    def from_yaml(cls, loader, node):
        return cls(name='', **loader.construct_mapping(node, deep=True))


class _SpaceSource(plugins.Source):
    """Source view of a Space: compiles it through the graph managers
    (sources.py:88-147)."""

    def __init__(self, space, asset_list):
        plugins.Source.__init__(self, space.name)
        self._space = space
        self._asset_list = asset_list
        self._video = None
        self._audio = None
        self._load_alert = None

    def bring_online(self):
        if self._load_alert:
            self.hide_alert(self._load_alert)
            self._load_alert = None
        try:
            from canvas_tpu.editor import graph
            self._video = graph.SpaceVideoManager(self._space,
                                                  self._asset_list)
            self._video.name = 'Video'
            self.follow_alerts(self._video)

            self._audio = graph.SpaceAudioManager(self._space,
                                                  self._asset_list)
            self._audio.name = 'Audio'
            self.follow_alerts(self._audio)

            plugins.Source.bring_online(self)
        except Exception as ex:
            _log.debug('Error while creating source for space "{0}"',
                       self.name, exc_info=True)
            self.take_offline()
            self._load_alert = plugins.Alert(
                'Unexpected ' + type(ex).__name__ +
                ' while creating source from space: ' + str(ex),
                icon=plugins.AlertIcon.Error, source=self.name,
                model_obj=self._space, exc_info=True)
            self.show_alert(self._load_alert)

    def take_offline(self):
        if self._load_alert:
            self.hide_alert(self._load_alert)
            self._load_alert = None
        if self._video:
            self.unfollow_alerts(self._video)
            self._video = None
        if self._audio:
            self.unfollow_alerts(self._audio)
            self._audio = None
        plugins.Source.take_offline(self)

    def get_streams(self):
        if self.offline:
            raise plugins.SourceOfflineError
        return [self._video, self._audio]


class SpaceAsset(Asset):
    yaml_tag = '!SpaceAsset'
    is_source = True
    is_composition = True

    def __init__(self, space, **kw):
        Asset.__init__(self, **kw)
        self._space = space
        self._source = None

    space = property(lambda self: self._space)

    def get_definition(self):
        d = Asset.get_definition(self)
        d['space'] = self._space
        return d

    def get_source(self):
        if not self._asset_list:
            raise RuntimeError('Asset list not set on asset')
        if not self._source:
            self._source = _SpaceSource(self._space, self._asset_list)
        return self._source

    def fixup(self):
        Asset.fixup(self)
        self._space.fixup()


class PluginSource(plugins.Source):
    """A source loaded through a plugin by URN + definition, with
    alert-based retry on failure (sources.py:233-368)."""

    def __init__(self, name, plugin_urn, definition, **kw):
        plugins.Source.__init__(self, name, **kw)
        self.definition = definition
        self.plugin_urn = plugin_urn
        self._plugin = None
        self._source = None
        self._load_alert = None

    def _handle_offline_changed(self, source):
        self.offline = self._source.offline

    def _alert_and_stay_offline(self, description, exc_info=False):
        self._load_alert = plugins.Alert(
            description, icon=plugins.AlertIcon.Error, source=self.name,
            model_obj=self, actions=[('Retry', self._retry_load)],
            exc_info=exc_info)
        self.show_alert(self._load_alert)

    # bring_online is a staged resolution pipeline: each stage either
    # completes (returns True) or publishes its failure alert and
    # returns False. Alerts are raised INSIDE the failing stage's
    # except block so Alert's sys.exc_info() capture sees the live
    # traceback. The set of stages and their failure texts match the
    # reference semantics (sources.py:233-368) that
    # tests/test_editor_model.py asserts; the decomposition is ours.

    def _stage_find_plugin(self):
        if self._plugin:
            return True
        self._plugin = plugins.PluginManager.find_plugin_by_urn(
            self.plugin_urn)
        if self._plugin is not None:
            return True
        _log.debug("Couldn't find plugin {0} for source {1}",
                   self.plugin_urn, self.name)
        self._alert_and_stay_offline(
            'Plugin ' + self.plugin_urn + ' unavailable or disabled')
        return False

    def _stage_create_source(self):
        if self._source:
            return True
        created = None
        try:
            created = self._plugin.create_source(self.name,
                                                 self.definition)
            created.offline_changed.connect(self._handle_offline_changed)
            self.follow_alerts(created)
            self._source = created
        except Exception as ex:
            self._source = None
            if created is not None:
                # undo a half-wired connection so a later
                # offline_changed can't fire into a None _source
                try:
                    created.offline_changed.disconnect(
                        self._handle_offline_changed)
                except Exception:
                    pass
            _log.debug('Error while creating source {0} from plugin',
                       self.name, exc_info=True)
            self._alert_and_stay_offline(
                'Unexpected ' + type(ex).__name__ +
                ' while creating source from plugin: ' + str(ex),
                exc_info=True)
            return False
        return True

    def _stage_activate(self):
        if not self._source.offline:
            return True
        try:
            self._source.bring_online()
        except Exception as ex:
            _log.debug('Error while bringing source {0} online',
                       self.name, exc_info=True)
            self._alert_and_stay_offline(
                'Unexpected ' + type(ex).__name__ +
                ' while bringing source online: ' + str(ex),
                exc_info=True)
            return False
        return True

    def bring_online(self):
        if not self.offline:
            return
        if self._load_alert:
            self.hide_alert(self._load_alert)
            self._load_alert = None
        for stage in (self._stage_find_plugin, self._stage_create_source,
                      self._stage_activate):
            if not stage():
                return
        if not self._source.offline:
            self.offline = False

    def _retry_load(self, checked=False):
        self.bring_online()

    def take_offline(self):
        if self.offline or not self._source:
            return
        try:
            self._source.take_offline()
        except Exception:
            pass
        self.offline = True

    @property
    def file_path(self):
        if self._source:
            return self._source.file_path
        return None

    def get_definition(self):
        return {'plugin_urn': self.plugin_urn,
                'definition': (self._source.get_definition()
                               if self._source else self.definition)}

    @classmethod
    def from_plugin_source(cls, source):
        return cls(source.name, source.plugin.plugin_urn,
                   source.get_definition())

    def _online_source(self):
        """The wrapped live source, or SourceOfflineError when this
        source is offline/unresolved (the guard every stream accessor
        shares)."""
        if self.offline or not self._source:
            raise plugins.SourceOfflineError
        return self._source

    def get_streams(self):
        return self._online_source().get_streams()

    def get_default_streams(self):
        return self._online_source().get_default_streams()

    def get_stream(self, name):
        return self._online_source().get_stream(name)


class PluginSourceAsset(Asset):
    yaml_tag = '!PluginSourceAsset'
    is_source = True
    is_composition = False

    def __init__(self, name, plugin_urn, definition, **kw):
        Asset.__init__(self, name=name, **kw)
        self._source = PluginSource(name, plugin_urn, definition)

    def get_definition(self):
        d = Asset.get_definition(self)
        d['plugin_urn'] = self._source.plugin_urn
        d['definition'] = self._source.get_definition()['definition']
        return d

    def get_source(self):
        return self._source


class RuntimeSource(plugins.Source):
    """A source with ready-made streams; not serializable (test support,
    sources.py:389-409)."""

    def __init__(self, name, streams):
        plugins.Source.__init__(self, name)
        self._streams = streams

    def get_stream_formats(self):
        return [(stream.name, stream.format)
                for stream in self._streams.values()]

    def get_streams(self):
        if self.offline:
            raise plugins.SourceOfflineError
        return list(self._streams.values())

    def get_stream(self, name):
        if self.offline:
            raise plugins.SourceOfflineError
        return self._streams[name]

    def get_definition(self):
        raise RuntimeError("Runtime sources can't be written to a file.")


class RuntimeSourceAsset(Asset):
    is_source = True

    def __init__(self, source):
        Asset.__init__(self, source.name)
        self._source = source

    def get_source(self):
        return self._source


class AssetStreamRef:
    """Reference to (asset path, stream name) (sources.py:421-456)."""

    yaml_tag = '!AssetStreamRef'

    def __init__(self, asset_path=None, stream=None, **kw):
        self._asset_path = asset_path
        self._stream = stream

    asset_path = property(lambda self: self._asset_path)
    stream = property(lambda self: self._stream)

    @classmethod
    def to_yaml(cls, dumper, data):
        return dumper.represent_mapping(cls.yaml_tag, {
            'asset_path': data._asset_path, 'stream': data._stream})

    @classmethod
    def from_yaml(cls, loader, node):
        return cls(**loader.construct_mapping(node, deep=True))

    def __eq__(self, other):
        return (isinstance(other, AssetStreamRef) and
                other._asset_path == self._asset_path and
                other._stream == self._stream)

    def __hash__(self):
        return hash((self._asset_path, self._stream))


class AssetList(MutableMapping):
    def __init__(self, assets=None):
        self.assets = assets or {}
        self.added = Signal()
        self.renamed = Signal()
        self.removed = Signal()

    def __getitem__(self, name):
        return self.assets[name]

    def __setitem__(self, name, value):
        old = self.assets.get(name)
        if old:
            self.removed(name)
            old._asset_list = None
            old.name = None
        self.assets[name] = value
        value._asset_list = self
        value.name = name
        self.added(name)

    def __delitem__(self, name):
        old = self.assets[name]
        self.removed(name)
        old._asset_list = None
        old.name = None
        del self.assets[name]

    def __len__(self):
        return len(self.assets)

    def __iter__(self):
        return iter(self.assets)

    def get_asset_list(self):
        return self.assets

    def fixup(self):
        for name, asset in self.assets.items():
            asset.name = name
            asset._asset_list = self
        for asset in self.assets.values():
            asset.fixup()


class Project:
    yaml_tag = '!Project'

    def __init__(self, known_formats=None, assets=None,
                 project_settings=None):
        self._known_formats = known_formats if known_formats is not None \
            else {}
        self._assets = assets if assets is not None else {}
        self._project_settings = project_settings if project_settings \
            is not None else {}

    def fixup(self):
        if isinstance(self._assets, dict):
            self._assets = AssetList(assets=self._assets)
        self._assets.fixup()

    assets = property(lambda self: self._assets)

    @classmethod
    def to_yaml(cls, dumper, data):
        assets = data._assets.get_asset_list() \
            if isinstance(data._assets, AssetList) else data._assets
        return dumper.represent_mapping(cls.yaml_tag, {
            'known_formats': data._known_formats,
            'assets': assets,
            'project_settings': data._project_settings})

    @classmethod
    def from_yaml(cls, loader, node):
        return cls(**loader.construct_mapping(node, deep=True))


def _yamlreg(cls):
    yaml.add_representer(cls, cls.to_yaml)
    yaml.add_constructor(cls.yaml_tag, cls.from_yaml)


_yamlreg(Asset)
_yamlreg(AssetStreamRef)
_yamlreg(Project)


def _space_asset_construct(loader, node):
    mapping = loader.construct_mapping(node, deep=True)
    space = mapping.pop('space')
    return SpaceAsset(space, name='', **mapping)


yaml.add_representer(SpaceAsset, SpaceAsset.to_yaml)
yaml.add_constructor('!SpaceAsset', _space_asset_construct)


def _plugin_source_asset_construct(loader, node):
    mapping = loader.construct_mapping(node, deep=True)
    return PluginSourceAsset(
        name='', plugin_urn=mapping['plugin_urn'],
        definition=mapping['definition'],
        keywords=mapping.get('keywords', ()))


yaml.add_representer(PluginSourceAsset, PluginSourceAsset.to_yaml)
yaml.add_constructor('!PluginSourceAsset', _plugin_source_asset_construct)
