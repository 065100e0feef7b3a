/* Minimal fake libnrsc5 implementing the public pipe-mode ABI subset the
 * binding uses (tests/test_hdradio.py builds it with g++): each
 * pipe_samples call emits SYNC, one AUDIO frame (program 0, 2048 s16
 * samples of a ramp), an ID3 tag and a SIS record through the callback —
 * proving the event struct layouts and callback plumbing end to end
 * without the real decoder. */

#include <stddef.h>
#include <stdlib.h>
#include <string.h>

typedef void (*nrsc5_callback_t)(void *evt, void *opaque);

struct fake_radio {
    nrsc5_callback_t cb;
    void *opaque;
    int mode;
    int started;
    int announced;
};

struct audio_evt { unsigned program; char *data; size_t count; };
struct id3_evt { unsigned program; const char *title; const char *artist;
                 const char *album; const char *genre; };
struct ber_evt { float cber; };
struct sis_evt { const char *country_code; int fcc_facility_id;
                 const char *name; const char *slogan; const char *message; };

struct event {
    unsigned event;
    union {
        struct audio_evt audio;
        struct id3_evt id3;
        struct ber_evt ber;
        struct sis_evt sis;
        char pad[256];
    } u;
};

enum { EVT_SYNC = 2, EVT_BER = 5, EVT_AUDIO = 7, EVT_ID3 = 8, EVT_SIS = 11 };

int nrsc5_open_pipe(void **radio) {
    struct fake_radio *r = (struct fake_radio *)calloc(1, sizeof(*r));
    *radio = r;
    return 0;
}

void nrsc5_set_mode(void *radio, int mode) {
    ((struct fake_radio *)radio)->mode = mode;
}

void nrsc5_set_callback(void *radio, nrsc5_callback_t cb, void *opaque) {
    struct fake_radio *r = (struct fake_radio *)radio;
    r->cb = cb;
    r->opaque = opaque;
}

void nrsc5_start(void *radio) { ((struct fake_radio *)radio)->started = 1; }
void nrsc5_stop(void *radio) { ((struct fake_radio *)radio)->started = 0; }
void nrsc5_close(void *radio) { free(radio); }

int nrsc5_pipe_samples_cs16(void *radio, void *samples, size_t n) {
    struct fake_radio *r = (struct fake_radio *)radio;
    (void)samples;
    (void)n;
    if (!r->cb || !r->started)
        return 0;
    struct event e;
    if (!r->announced) {
        r->announced = 1;
        memset(&e, 0, sizeof(e));
        e.event = EVT_SYNC;
        r->cb(&e, r->opaque);
        memset(&e, 0, sizeof(e));
        e.event = EVT_SIS;
        e.u.sis.name = "FAKE-HD";
        e.u.sis.slogan = "it is not real";
        r->cb(&e, r->opaque);
        memset(&e, 0, sizeof(e));
        e.event = EVT_ID3;
        e.u.id3.program = 0;
        e.u.id3.title = "Test Tone";
        e.u.id3.artist = "libfake";
        r->cb(&e, r->opaque);
    }
    static short pcm[2048];
    for (int i = 0; i < 2048; i++)
        pcm[i] = (short)((i % 256) * 64 - 8192);
    memset(&e, 0, sizeof(e));
    e.event = EVT_AUDIO;
    e.u.audio.program = 0;
    e.u.audio.data = (char *)pcm;
    e.u.audio.count = 2048;
    r->cb(&e, r->opaque);
    memset(&e, 0, sizeof(e));
    e.event = EVT_BER;
    e.u.ber.cber = 0.0125f;
    r->cb(&e, r->opaque);
    return 0;
}
