"""The reference's own sample project files open here verbatim.

A user switching from fluggo/Canvas brings their saved ``.yaml``
projects with them. These tests load ``/root/reference/test_timeline.yaml``
(the reference's current-format sample: /root/reference/qttest.py:795-827
loads exactly this document class) byte-for-byte, assert full model
fidelity, round-trip it, and open it through the editor app —
degrading to alerts for the missing media path, and coming fully
online when the path is rewritten to real media.

The other two samples (test.yaml, test_audio.yaml) use legacy
``!MediaContainer``/``!StreamSourceRef`` tags for which the reference
itself registers no constructors (verified: no such class exists under
/root/reference/fluggo/) — they are unloadable in the reference too
and are not a compatibility target.
"""

import fractions
import math
import os

import numpy as np
import pytest
import yaml

from canvas_tpu.basetypes import box2i, v2i
from canvas_tpu.editor import model
from canvas_tpu.editor.plugins import PluginManager
from canvas_tpu.editor.settings import set_settings_path

REF_PROJECT = '/root/reference/test_timeline.yaml'

needs_reference = pytest.mark.skipif(
    not os.path.exists(REF_PROJECT),
    reason='reference checkout not present')


@pytest.fixture(autouse=True)
def fresh_settings(tmp_path):
    set_settings_path(str(tmp_path / 'settings.json'))
    PluginManager._reset_for_tests()
    yield
    PluginManager._reset_for_tests()


def _load_reference_project():
    import canvas_tpu.editor.plugins  # registers !VideoFormat/!AudioFormat
    with open(REF_PROJECT) as stream:
        return yaml.load(stream, Loader=yaml.Loader)


def _assert_reference_structure(project):
    assert isinstance(project, model.Project)
    assert sorted(project.assets.keys()) == ['79b', 'test']

    dv = project.assets['79b']
    assert isinstance(dv, model.PluginSourceAsset)
    dv_source = dv.get_source()
    assert dv_source.plugin_urn == 'urn:fluggo.com/canvas/plugins:libav-dv'
    assert dv_source.definition['path'] == (
        '/home/james/Videos/tape-2003-christmas-in-colorado.dv')

    space = project.assets['test'].space
    vf = space.video_format
    assert vf.frame_rate == fractions.Fraction(24000, 1001)
    assert vf.full_frame == box2i(v2i(-8, -1), v2i(711, 478))
    assert vf.active_area == box2i(v2i(0, -1), v2i(703, 478))
    assert vf.pixel_aspect_ratio == fractions.Fraction(40, 33)
    af = space.audio_format
    assert af.sample_rate == 48000
    assert list(af.channel_assignment) == ['FrontLeft', 'FrontRight']

    assert len(space) == 3
    video_clip, audio_clip, seq = space[0], space[1], space[2]

    assert video_clip.type() == 'video'
    assert (video_clip.x, video_clip.length, video_clip.offset) == (
        60, 100, 1000)
    assert video_clip.source.asset_path == '79b'
    assert video_clip.source.stream == '0'

    # The document's &A/*A anchor: the audio clip is two-way anchored
    # to the video clip object itself.
    assert audio_clip.type() == 'audio'
    assert audio_clip.anchor is not None
    assert audio_clip.anchor.target is video_clip
    assert audio_clip.anchor.two_way is True

    assert seq.type() == 'video'
    assert seq.expanded is True
    assert [(i.offset, i.length, i.transition_length) for i in seq] == [
        (0, 300, 0), (1050, 300, 48)]


@needs_reference
def test_reference_timeline_loads_verbatim():
    _assert_reference_structure(_load_reference_project())


@needs_reference
def test_reference_timeline_round_trips():
    project = _load_reference_project()
    project.fixup()
    dumped = yaml.dump(project)
    _assert_reference_structure(yaml.load(dumped, Loader=yaml.Loader))


@needs_reference
def test_editor_app_opens_reference_project_offline():
    """open_file + open_space on the reference project: the media path
    doesn't exist here, so the source must degrade to alerts and empty
    frames — the reference's soft-failure contract
    (connectors.py:55-146) — not crash."""
    from canvas_tpu.editor.ui.app import EditorApp

    app = EditorApp()  # loads + enables discovered plugins per settings
    for p in PluginManager.find_plugins(enabled_only=False):
        PluginManager.set_plugin_enabled(p, True)

    project = app.open_file(REF_PROJECT)
    assert sorted(project.assets.keys()) == ['79b', 'test']

    editor = app.open_space('test')
    stream = editor.video_stream
    frame = stream.get_frame_f16(65, box2i(0, 0, 63, 47))
    assert frame.current_window.empty()

    # Somebody along the chain surfaced the failure as an alert.
    asset = project.assets['79b']
    source = asset.get_source()
    assert source.offline or source.alerts


def test_plugin_urn_alias_resolution():
    """find_plugin_by_urn resolves the reference's plugin/codec urns to
    our implementations (dv.py:36,71,115)."""
    from canvas_tpu.editor.plugins.libav_plugin import (
        DVVideoCodec, GenericAudioCodec, LibavCodecPlugin,
        LibavSourcePlugin)

    PluginManager.load_all()
    PluginManager.set_plugin_enabled(LibavCodecPlugin, True)
    assert PluginManager.find_plugin_by_urn(
        'urn:fluggo.com/canvas/plugins:libav-dv',
        enabled_only=False) is LibavSourcePlugin
    # Primary urn still wins over any alias.
    assert PluginManager.find_plugin_by_urn(
        'urn:canvas-tpu/plugins:libav',
        enabled_only=False) is LibavSourcePlugin
    assert PluginManager.find_codec_by_urn(
        'urn:fluggo.com/canvas/codecs:libav-dv-codec') is DVVideoCodec
    assert PluginManager.find_codec_by_urn(
        'urn:fluggo.com/canvas/codecs:libav-pcm-codec') is GenericAudioCodec


@needs_reference
def test_reference_project_comes_online_with_real_media(tmp_path):
    """Rewrite the reference project's media path to a file that exists
    and the whole chain lights up: fluggo plugin urn -> alias -> our
    libav source -> codec detection -> live video frames."""
    libav = pytest.importorskip('canvas_tpu.libav')
    if not libav.available():
        pytest.skip('native canvas_av unavailable')
    from canvas_tpu.editor.ui.app import EditorApp

    media_path = str(tmp_path / 'clip.avi')
    # Clip A sits at x=60 with offset=1000, so pulling timeline frame 65
    # reads source frame 1005 — the media must actually be that long.
    with libav.AVMuxer(media_path) as mux:
        v = mux.add_video_stream('mpeg4', (64, 48), 25, bit_rate=400_000)
        a = mux.add_audio_stream('pcm_s16le', 8000, 1)
        mux.start()
        frame = np.zeros((48, 64, 4), np.uint8)
        frame[:, :, 1] = 150
        frame[:, :, 3] = 255
        for _ in range(1010):
            mux.write_video_frame(v, frame)
        t = np.arange(3200, dtype=np.float32) / 8000.0
        mux.write_audio_frame(
            a, (0.25 * np.sin(2 * math.pi * 220 * t)).reshape(-1, 1))

    doc = open(REF_PROJECT).read().replace(
        '/home/james/Videos/tape-2003-christmas-in-colorado.dv', media_path)
    path = tmp_path / 'project.yaml'
    path.write_text(doc)

    app = EditorApp()
    for p in PluginManager.find_plugins(enabled_only=False):
        PluginManager.set_plugin_enabled(p, True)
    app.open_file(str(path))
    editor = app.open_space('test')

    # Video clip A: x=60, length=100 — inside it frames are live.
    frame = editor.video_stream.get_frame_f16(65, box2i(0, 0, 63, 47))
    assert not frame.current_window.empty()
    px = frame.pixel(32, 24)
    assert px is not None and float(px.g) > float(px.r)

    source = app.asset_list['79b'].get_source()
    assert not source.offline
