"""Editor plugin framework: alerts, manager, libav source plugin.

Mirrors the reference's editor plugin behaviors
(/root/reference/fluggo/editor/plugins/, tests/canvas/VideoSourceRefConnector.py
fixtures).
"""

import math

import numpy as np
import pytest

from canvas_tpu.basetypes import box2i
from canvas_tpu.editor import plugins
from canvas_tpu.editor.plugins import (Alert, AlertIcon, AlertPublisher,
                                       PluginManager)
from canvas_tpu.editor.settings import set_settings_path


@pytest.fixture(autouse=True)
def fresh_settings(tmp_path):
    set_settings_path(str(tmp_path / 'settings.json'))
    PluginManager._reset_for_tests()
    yield
    PluginManager._reset_for_tests()


def test_alert_publisher_basics():
    pub = AlertPublisher()
    seen = []
    pub.alert_added.connect(lambda a: seen.append(('add', a)))
    pub.alert_removed.connect(lambda a: seen.append(('rm', a)))

    alert = Alert('something broke', icon=AlertIcon.Error, key='k1')
    pub.show_alert(alert)
    assert pub.alerts == [alert]
    assert seen == [('add', alert)]

    pub.hide_alert(alert)
    assert pub.alerts == []
    assert seen[-1] == ('rm', alert)


def test_alert_following():
    upstream = AlertPublisher()
    downstream = AlertPublisher()
    downstream.follow_alerts(upstream)

    alert = Alert('upstream issue', key='k')
    upstream.show_alert(alert)
    assert downstream.alerts == [alert]

    upstream.hide_alert(alert)
    assert downstream.alerts == []

    # unfollow stops propagation
    upstream.show_alert(alert)
    assert downstream.alerts == [alert]
    downstream.unfollow_alerts(upstream)
    assert downstream.alerts == []


def test_plugin_discovery_and_enable():
    PluginManager.load_all()
    from canvas_tpu.editor.plugins.libav_plugin import LibavSourcePlugin
    plugin = PluginManager.find_plugin_by_urn(
        'urn:canvas-tpu/plugins:libav', enabled_only=False)
    assert plugin is LibavSourcePlugin
    # disabled by default
    assert not PluginManager.is_plugin_enabled(plugin)
    PluginManager.set_plugin_enabled(plugin, True)
    assert PluginManager.is_plugin_enabled(plugin)
    assert plugin in PluginManager.find_plugins()


def test_codec_priorities():
    PluginManager.load_all()
    from canvas_tpu.editor.plugins.libav_plugin import (
        DVVideoCodec, GenericVideoCodec, LibavCodecPlugin)
    PluginManager.set_plugin_enabled(LibavCodecPlugin, True)
    decoders = PluginManager.find_decoders(
        'urn:canvas:codec-format:dvvideo')
    assert DVVideoCodec in decoders
    # DV codec has higher priority than the generic fallback
    assert decoders.index(DVVideoCodec) < decoders.index(GenericVideoCodec)

    PluginManager.set_decoder_enabled(DVVideoCodec, False)
    decoders = PluginManager.find_decoders('urn:canvas:codec-format:dvvideo')
    assert DVVideoCodec not in decoders
    PluginManager.set_decoder_enabled(DVVideoCodec, True)

    PluginManager.set_decoder_priority(GenericVideoCodec, 10)
    decoders = PluginManager.find_decoders('urn:canvas:codec-format:dvvideo')
    assert decoders.index(GenericVideoCodec) < decoders.index(DVVideoCodec)


@pytest.fixture(scope='module')
def media_file(tmp_path_factory):
    libav = pytest.importorskip('canvas_tpu.libav')
    if not libav.available():
        pytest.skip('native canvas_av unavailable')
    path = str(tmp_path_factory.mktemp('plug') / 'clip.avi')
    with libav.AVMuxer(path) as mux:
        v = mux.add_video_stream('mpeg4', (64, 48), 25, bit_rate=400_000)
        a = mux.add_audio_stream('pcm_s16le', 8000, 1)
        mux.start()
        for i in range(10):
            frame = np.zeros((48, 64, 4), np.uint8)
            frame[:, :, 2] = 100
            frame[:, :, 3] = 255
            mux.write_video_frame(v, frame)
        t = np.arange(3200, dtype=np.float32) / 8000.0
        mux.write_audio_frame(
            a, (0.25 * np.sin(2 * math.pi * 220 * t)).reshape(-1, 1))
    return path


def test_libav_source_end_to_end(media_file):
    PluginManager.load_all()
    from canvas_tpu.editor.plugins.libav_plugin import (LibavCodecPlugin,
                                                       LibavSourcePlugin)
    PluginManager.set_plugin_enabled(LibavCodecPlugin, True)
    PluginManager.set_plugin_enabled(LibavSourcePlugin, True)

    source = LibavSourcePlugin.create_source_from_file('clip', media_file)
    assert source is not None
    assert not source.offline
    streams = source.get_streams()
    assert len(streams) == 2
    video = [s for s in streams if s.stream_type == 'video'][0]
    audio = [s for s in streams if s.stream_type == 'audio'][0]

    # video decodes through the connector chain
    frame = video.get_frame_f16(0, box2i(0, 0, 63, 47))
    assert not frame.current_window.empty()
    px = frame.pixel(32, 24)
    assert px.b > px.r    # blue-ish frame

    # audio decodes
    aframe = audio.get_frame(0, 999, 1)
    data = np.asarray(aframe.data)
    assert float(np.abs(data).max()) > 0.1

    # definition round trip
    definition = source.get_definition()
    assert definition['path'] == media_file
    source2 = LibavSourcePlugin.create_source('clip2', definition)
    source2.bring_online()
    assert not source2.offline


def test_decoder_connector_missing_codec_alert(media_file):
    PluginManager.load_all()
    from canvas_tpu.editor.plugins.libav_plugin import LibavCodecPlugin
    PluginManager.set_plugin_enabled(LibavCodecPlugin, True)
    from canvas_tpu import libav

    demux = libav.AVDemuxer(media_file, 0)
    connector = plugins.VideoDecoderConnector(
        demux, 'urn:canvas:codec-format:mpeg4', 0, 10,
        codec_urn='urn:does-not-exist')
    assert connector.decoder is None
    assert len(connector.alerts) == 1
    assert 'Could not find codec' in str(connector.alerts[0])

    # a frame pull degrades to empty rather than crashing
    frame = connector.get_frame_f16(0, box2i(0, 0, 15, 15))
    assert frame.current_window.empty()


def test_editor_app_full_workflow(media_file, tmp_path):
    """The qttest.py workflow headless (scripts/demo_project.py as a CI
    guard): import -> timeline -> undoable edit -> YAML round trip ->
    recompile -> pixel check."""
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.editor import model
    from canvas_tpu.editor.ui.app import EditorApp

    PluginManager.load_all()
    for p in PluginManager.find_plugins(enabled_only=False):
        PluginManager.set_plugin_enabled(p, True)

    app = EditorApp()
    asset = app.import_file('clip', media_file)
    assert asset is not None

    editor = app.new_space('main')
    items = app.add_asset_to_space(editor, 'clip', x=0, length=10)
    vclip = next(i for i in items if i.type() == 'video')
    cmd = model.MoveItemCommand(vclip, x=4, y=vclip.y)
    editor.undo_stack.push(cmd)
    editor.undo_stack.undo()
    assert vclip.x == 0
    editor.undo_stack.redo()
    assert vclip.x == 4

    project_path = str(tmp_path / 'proj.yaml')
    app.save_file(project_path)

    app2 = EditorApp()
    app2.open_file(project_path)
    editor2 = app2.open_space('main')
    stream = editor2.video_stream

    # before the clip: empty; at frame 5 the blue-ish media shows
    f_before = stream.get_frame_f16(0, box2i(0, 0, 63, 47))
    assert f_before.current_window.empty()
    f_in = stream.get_frame_f16(5, box2i(0, 0, 63, 47))
    assert not f_in.current_window.empty()
    px = f_in.pixel(32, 24)
    assert px.b > px.r        # media frame is blue-dominant


def test_set_base_filter_signals_range_union():
    """set_base_filter's frames_updated range is the UNION of old and
    new defined ranges (the reference's documented contract; its code
    took min() for the end — under-invalidating grown ranges, which
    matters now that the planner honors ranged signals)."""
    from canvas_tpu.editor.plugins._source import AudioStream, VideoStream
    from canvas_tpu.sources import SolidColorVideoSource

    vs = VideoStream(SolidColorVideoSource((1, 0, 0, 1)), range=(0, 99))
    seen = []
    vs.frames_updated.connect(lambda _s, a, b: seen.append((a, b)))
    vs.set_base_filter(SolidColorVideoSource((0, 1, 0, 1)),
                       new_range=(10, 199))
    assert seen == [(0, 199)]

    # shrink: the union still covers the frames that just went away
    vs.set_base_filter(SolidColorVideoSource((0, 0, 1, 1)),
                       new_range=(0, 49))
    assert seen[-1] == (0, 199)

    # unbounded end stays None (planner falls back to a full clear)
    aus = AudioStream(None, range=(0, None))
    seen_a = []
    aus.frames_updated.connect(lambda _s, a, b: seen_a.append((a, b)))
    aus.set_base_filter(None, new_range=(0, 500))
    assert seen_a == [(0, None)]


def test_audio_format_yaml_round_trip():
    """channel_assignment must survive a save/load: shallow YAML
    construction handed over a not-yet-filled list and `or []` swapped
    in a fresh one, so PyYAML's deferred fill landed in a discarded
    object (reference inherits this: fluggo/editor/plugins/_source.py:393)."""
    import yaml
    fmt = plugins.AudioFormat(48000, ['FL', 'FR'])
    loaded = yaml.load(yaml.dump(fmt), Loader=yaml.Loader)
    assert loaded.channel_assignment == ['FL', 'FR']
    assert loaded.sample_rate == 48000


def test_decoder_connector_none_format_urn(media_file):
    """format_urn=None with a codec_urn is legal; error paths that
    %-formatted it with + concatenation used to raise TypeError from
    inside the handler, escaping the constructor instead of publishing
    the alert."""
    PluginManager.load_all()
    from canvas_tpu.editor.plugins.libav_plugin import LibavCodecPlugin
    PluginManager.set_plugin_enabled(LibavCodecPlugin, True)
    from canvas_tpu import libav

    demux = libav.AVDemuxer(media_file, 0)
    connector = plugins.VideoDecoderConnector(
        demux, None, 0, 10, codec_urn='urn:does-not-exist')
    assert connector.decoder is None
    assert len(connector.alerts) == 1

    # no codec_urn and no format_urn: find_decoders(None) probes every
    # codec — the constructor must not crash on string concatenation;
    # either a codec takes the stream or a degraded alert publishes
    connector2 = plugins.VideoDecoderConnector(demux, None, 0, 10)
    assert connector2.decoder is not None or len(connector2.alerts) == 1
