// Native smoke test for canvas_av, runnable under ASAN/TSAN
// (make test / make asan-test). Exercises the mux -> probe -> demux ->
// decode -> planar-encode cycle without Python.

#include <cassert>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <cstdint>
#include <cstdlib>

extern "C" {
struct CavFormat;
struct CavVideoDec;
struct CavMuxer;
struct CavEncoder;
struct CavPacket {
    uint8_t *data;
    int32_t size;
    int64_t pts, dts, duration;
    int32_t keyframe;
    int32_t stream;
};
CavMuxer *cav_muxer_create(const char *, const char *, char *, int);
int cav_muxer_add_video(CavMuxer *, const char *, int, int, int, int,
                        int64_t, const char *, char *, int);
int cav_muxer_start(CavMuxer *, char *, int);
int cav_muxer_write_video(CavMuxer *, int, const uint8_t *);
int cav_muxer_finish(CavMuxer *);
CavFormat *cav_open(const char *, char *, int);
void cav_close(CavFormat *);
int cav_stream_count(CavFormat *);
int cav_read_packet(CavFormat *, int, CavPacket *);
void cav_packet_free(CavPacket *);
CavVideoDec *cav_video_decoder_open(const char *, int, char *, int);
void cav_video_decoder_close(CavVideoDec *);
int cav_video_decode_rgba(CavVideoDec *, int64_t, uint8_t *, int, int);
int cav_video_decode_planar(CavVideoDec *, int64_t, uint8_t *, uint8_t *,
                            uint8_t *, int *, int64_t, int64_t);
int cav_muxer_add_copy_video(CavMuxer *, const char *, int, int, int, int,
                             int, int, char *, int);
int cav_muxer_set_extradata(CavMuxer *, int, const uint8_t *, int);
int cav_muxer_write_packet(CavMuxer *, int, const uint8_t *, int, int64_t,
                           int64_t, int64_t, int);
const char *cav_version();
}

// Feed one corrupted byte stream through open -> demux -> decode; the
// sanitizer is the assertion (overreads in the packet loop or plane
// copies trip ASAN), plus a sanity cap on how much can come out.
static void drain_corrupt(const char *path) {
    char err[512] = {0};
    CavFormat *fmt = cav_open(path, err, sizeof(err));
    if (fmt) {
        CavPacket pkt;
        int packets = 0;
        while (packets < 1000 && cav_read_packet(fmt, 0, &pkt) == 1) {
            packets++;
            cav_packet_free(&pkt);
        }
        assert(packets < 1000 && "demux of corrupt file must terminate");
        cav_close(fmt);
    }
    CavVideoDec *dec = cav_video_decoder_open(path, -1, err, sizeof(err));
    if (dec) {
        std::vector<uint8_t> rgba(64 * 48 * 4);
        std::vector<uint8_t> y(64 * 48), cb(64 * 48), cr(64 * 48);
        int dims[6] = {0};
        for (int i = 0; i < 12; i++) {
            if (cav_video_decode_rgba(dec, i, rgba.data(), 64, 48) <= 0)
                break;
        }
        // planar path with tight capacities: capacity checks, not the
        // file's claimed dimensions, must bound the copies
        cav_video_decode_planar(dec, 0, y.data(), cb.data(), cr.data(),
                                dims, (int64_t)y.size(),
                                (int64_t)cb.size());
        cav_video_decoder_close(dec);
    }
}

int main() {
    char err[512] = {0};
    const char *path = "/tmp/canvas_av_selftest.avi";

    // Mux 10 ramping frames
    CavMuxer *mux = cav_muxer_create(path, "", err, sizeof(err));
    assert(mux && "muxer create");
    int v = cav_muxer_add_video(mux, "mpeg4", 64, 48, 25, 1, 400000, "",
                                err, sizeof(err));
    assert(v == 0 && "add stream");
    assert(cav_muxer_start(mux, err, sizeof(err)) == 0);
    std::vector<uint8_t> frame(64 * 48 * 4, 0);
    for (int i = 0; i < 10; i++) {
        for (int p = 0; p < 64 * 48; p++) {
            frame[p * 4 + 0] = (uint8_t)(i * 20);
            frame[p * 4 + 3] = 255;
        }
        assert(cav_muxer_write_video(mux, v, frame.data()) >= 0);
    }
    assert(cav_muxer_finish(mux) >= 0);

    // Probe + demux
    CavFormat *fmt = cav_open(path, err, sizeof(err));
    assert(fmt && "open");
    assert(cav_stream_count(fmt) == 1);
    CavPacket pkt;
    int packets = 0;
    while (cav_read_packet(fmt, 0, &pkt) == 1) {
        packets++;
        cav_packet_free(&pkt);
    }
    assert(packets == 10);
    cav_close(fmt);

    // Decode with random access
    CavVideoDec *dec = cav_video_decoder_open(path, -1, err, sizeof(err));
    assert(dec && "decoder open");
    std::vector<uint8_t> out(64 * 48 * 4);
    assert(cav_video_decode_rgba(dec, 8, out.data(), 64, 48) == 1);
    int late = out[(24 * 64 + 32) * 4];
    assert(cav_video_decode_rgba(dec, 0, out.data(), 64, 48) == 1);
    int early = out[(24 * 64 + 32) * 4];
    assert(late > early + 50 && "ramp decoded");
    cav_video_decoder_close(dec);

    // Corrupt-input robustness: truncations and bit-flips of the file
    // just written must fail cleanly (Python sees IOError; here the
    // sanitizer catches any overread/overwrite).
    std::vector<uint8_t> good;
    {
        FILE *f = fopen(path, "rb");
        assert(f);
        fseek(f, 0, SEEK_END);
        long n = ftell(f);
        fseek(f, 0, SEEK_SET);
        good.resize((size_t)n);
        assert(fread(good.data(), 1, good.size(), f) == good.size());
        fclose(f);
    }
    const char *bad = "/tmp/canvas_av_selftest_bad.avi";
    size_t cuts[] = {1, 8, 64, 256, good.size() / 4, good.size() / 2,
                     good.size() - 64, good.size() - 1};
    for (size_t cut : cuts) {
        FILE *f = fopen(bad, "wb");
        assert(f);
        fwrite(good.data(), 1, cut, f);
        fclose(f);
        drain_corrupt(bad);
    }
    uint64_t lcg = 0x2545F4914F6CDD1DULL;   // deterministic bit flips
    for (int round = 0; round < 8; round++) {
        std::vector<uint8_t> flip(good);
        for (int k = 0; k < 24; k++) {
            lcg = lcg * 6364136223846793005ULL + 1442695040888963407ULL;
            flip[(size_t)(lcg % flip.size())] ^= (uint8_t)(lcg >> 32);
        }
        FILE *f = fopen(bad, "wb");
        assert(f);
        fwrite(flip.data(), 1, flip.size(), f);
        fclose(f);
        drain_corrupt(bad);
    }
    remove(bad);

    // Threaded stress: the library's contract is one owner per
    // instance, but INSTANCES run concurrently (Python's prepare
    // thread decodes while the GUI probes another file). Four threads
    // each mux/demux/decode their own file in parallel; under TSAN
    // this validates there is no hidden shared state (lazy codec
    // registries, version string, swscale contexts).
    {
        auto worker = [](int tid) {
            char terr[512] = {0};
            std::string tp = "/tmp/canvas_av_selftest_t" +
                std::to_string(tid) + ".avi";
            (void)cav_version();
            CavMuxer *tm = cav_muxer_create(tp.c_str(), "", terr,
                                            sizeof(terr));
            assert(tm);
            int tv = cav_muxer_add_video(tm, "mpeg4", 64, 48, 25, 1,
                                         400000, "", terr, sizeof(terr));
            assert(tv == 0);
            assert(cav_muxer_start(tm, terr, sizeof(terr)) == 0);
            std::vector<uint8_t> tf(64 * 48 * 4, 0);
            for (int i = 0; i < 6; i++) {
                for (int p = 0; p < 64 * 48; p++) {
                    tf[p * 4 + 1] = (uint8_t)(tid * 40 + i * 10);
                    tf[p * 4 + 3] = 255;
                }
                assert(cav_muxer_write_video(tm, tv, tf.data()) >= 0);
            }
            assert(cav_muxer_finish(tm) >= 0);

            CavFormat *tfmt = cav_open(tp.c_str(), terr, sizeof(terr));
            assert(tfmt);
            CavPacket tpkt;
            int tp_count = 0;
            while (cav_read_packet(tfmt, 0, &tpkt) == 1) {
                tp_count++;
                cav_packet_free(&tpkt);
            }
            assert(tp_count == 6);
            cav_close(tfmt);

            CavVideoDec *td = cav_video_decoder_open(tp.c_str(), -1,
                                                     terr, sizeof(terr));
            assert(td);
            std::vector<uint8_t> tout(64 * 48 * 4);
            assert(cav_video_decode_rgba(td, 5, tout.data(), 64, 48) == 1);
            assert(cav_video_decode_rgba(td, 0, tout.data(), 64, 48) == 1);
            cav_video_decoder_close(td);
            remove(tp.c_str());
        };
        std::thread threads[4];
        for (int t = 0; t < 4; t++)
            threads[t] = std::thread(worker, t);
        for (int t = 0; t < 4; t++)
            threads[t].join();
    }

    // Stream-copy remux (the AVMuxer.run model): demux the original's
    // packets and write them UNRE-ENCODED into a new container via a
    // copy stream, then decode the remux and check the ramp survived
    // byte-identical compression.
    {
        const char *copy_path = "/tmp/canvas_av_selftest_copy.avi";
        CavMuxer *cm = cav_muxer_create(copy_path, "avi", err, sizeof(err));
        assert(cm && "copy muxer create");
        int cv = cav_muxer_add_copy_video(cm, "mpeg4", 64, 48, 25, 1,
                                          0, 0, err, sizeof(err));
        assert(cv == 0 && "add copy stream");
        // mpeg4-in-avi needs no extradata, but the call must be safe
        uint8_t dummy[4] = {0, 0, 1, 0xB0};
        assert(cav_muxer_set_extradata(cm, cv, dummy, 0) == 0);
        assert(cav_muxer_start(cm, err, sizeof(err)) == 0);
        CavFormat *src = cav_open(path, err, sizeof(err));
        assert(src);
        CavPacket cpkt;
        int copied = 0;
        while (cav_read_packet(src, 0, &cpkt) == 1) {
            assert(cav_muxer_write_packet(cm, cv, cpkt.data, cpkt.size,
                                          cpkt.pts, cpkt.dts,
                                          cpkt.duration,
                                          cpkt.keyframe) >= 0);
            copied++;
            cav_packet_free(&cpkt);
        }
        cav_close(src);
        assert(copied == 10);
        assert(cav_muxer_finish(cm) >= 0);

        CavVideoDec *cd = cav_video_decoder_open(copy_path, -1, err,
                                                 sizeof(err));
        assert(cd && "copy decode open");
        std::vector<uint8_t> cout_(64 * 48 * 4);
        assert(cav_video_decode_rgba(cd, 8, cout_.data(), 64, 48) == 1);
        int clate = cout_[(24 * 64 + 32) * 4];
        assert(cav_video_decode_rgba(cd, 0, cout_.data(), 64, 48) == 1);
        int cearly = cout_[(24 * 64 + 32) * 4];
        assert(clate == late && cearly == early &&
               "stream copy is bit-preserving");
        cav_video_decoder_close(cd);
        remove(copy_path);
    }

    printf("canvas_av selftest OK (%d packets, ramp %d -> %d)\n",
           packets, early, late);
    remove(path);
    return 0;
}
