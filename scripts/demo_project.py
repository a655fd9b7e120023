#!/usr/bin/env python
"""End-to-end editor demo: synthesize media, build a project, save and
reload it as YAML, compile the timeline, and export the result.

Exercises the whole stack in one pass (the reference's qttest.py
workflow, headless):

  1. write_video renders synthetic media to an AVI (native canvas_av).
  2. EditorApp imports it through the libav source plugin.
  3. A space gets two clips of it plus an animated solid, with an edit
     through the undo system.
  4. The project round-trips through YAML (save + reopen).
  5. SpaceEditor compiles the reloaded model to the engine graph and
     write_video exports the composite through the batched device path.

Usage: demo_project.py [WORKDIR]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

if os.environ.get('CANVAS_FORCE_CPU'):
    import jax

    jax.config.update('jax_platforms', 'cpu')


def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else '/tmp/canvas_demo'
    os.makedirs(workdir, exist_ok=True)
    media_path = os.path.join(workdir, 'demo_media.avi')
    project_path = os.path.join(workdir, 'demo_project.yaml')
    out_path = os.path.join(workdir, 'demo_out.avi')

    from canvas_tpu import libav, process
    from canvas_tpu.basetypes import box2i
    from canvas_tpu.editor import model
    from canvas_tpu.editor.ui.app import EditorApp

    window = box2i(0, 0, 319, 239)

    # 1. Synthesize source media
    ws = process.VideoWorkspace()
    ws.add(source=process.SolidColorVideoSource(
        process.LerpFunc((0.8, 0.2, 0.1, 1), (0.1, 0.2, 0.8, 1), 72)),
        x=0, length=72, z=0)
    libav.write_video(media_path, ws, None, 0, 72, frame_size=(320, 240),
                      video_codec='mpeg4', window=window)
    print('media:', media_path)

    # 2. Import through the plugin system (enable the libav plugins —
    # enablement persists in the JSON settings store, like the
    # reference's QSettings)
    from canvas_tpu.editor import plugins as plugin_mod
    from canvas_tpu.editor.settings import set_settings_path
    set_settings_path(os.path.join(workdir, 'settings.json'))
    plugin_mod.PluginManager.load_all()
    for p in plugin_mod.PluginManager.find_plugins(enabled_only=False):
        plugin_mod.PluginManager.set_plugin_enabled(p, True)

    app = EditorApp()
    asset = app.import_file('demo', media_path)
    assert asset is not None, 'libav source plugin did not claim the file'

    # 3. Build a timeline: two clips of the media
    editor = app.new_space('main')
    app.add_asset_to_space(editor, 'demo', x=0, length=36)
    (clip2,) = [i for i in app.add_asset_to_space(
        editor, 'demo', x=36, length=36) if i.type() == 'video']
    clip2.update(offset=36)
    # move the second clip with an undoable command, then undo/redo it
    cmd = model.MoveItemCommand(clip2, x=40, y=clip2.y)
    editor.undo_stack.push(cmd)
    editor.undo_stack.undo()
    editor.undo_stack.redo()
    assert clip2.x == 40

    # 4. YAML round trip
    app.save_file(project_path)
    print('project:', project_path)
    app2 = EditorApp()
    app2.open_file(project_path)
    editor2 = app2.open_space('main')

    # 5. Compile + export through the batched device path
    stream = editor2.video_stream
    libav.write_video(out_path, stream, None, 0, 76,
                      frame_size=(320, 240), video_codec='mpeg4',
                      window=window)
    cont = libav.AVContainer(out_path)
    info = cont.streams[0]
    print('export:', out_path, info.codec, info.frame_size,
          info.frame_count, 'frames')
    assert info.frame_count == 76
    print('demo OK')
    return 0


if __name__ == '__main__':
    sys.exit(main())
