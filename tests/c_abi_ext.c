/* Exercises the C ABI surface beyond transcription: raw mel/encode/decode
 * with logits, model introspection, language helpers, timings, state
 * accessors, and the log callback.  Driven by tests/test_cabi.py. */
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#include "whisper_tpu.h"

static int n_logs = 0;
static void on_log(int level, const char * text, void * ud) {
    (void) level; (void) text; (void) ud;
    n_logs++;
}

int main(int argc, char ** argv) {
    if (argc < 2) { fprintf(stderr, "usage: %s model.bin\n", argv[0]); return 2; }

    whisper_log_set(on_log, NULL);

    struct whisper_context_params * cp = whisper_context_default_params_by_ref();
    struct whisper_context * ctx =
        whisper_init_from_file_with_params(argv[1], *cp);
    whisper_free_context_params(cp);
    if (!ctx) { fprintf(stderr, "init failed\n"); return 1; }

    printf("MODEL|%d|%d|%d|%d|%s\n",
           whisper_model_n_vocab(ctx), whisper_model_n_audio_layer(ctx),
           whisper_model_n_text_layer(ctx), whisper_model_n_mels(ctx),
           whisper_model_type_readable(ctx));
    printf("LANG|%d|%s|%s\n", whisper_lang_max_id(),
           whisper_lang_str(0), whisper_lang_str_full(0));

    /* raw path: 1 s of silence -> mel -> encode -> decode sot */
    int n = 16000;
    float * pcm = (float *) calloc(n, sizeof(float));
    if (whisper_pcm_to_mel(ctx, pcm, n, 1) != 0) return 1;
    printf("NLEN|%d\n", whisper_n_len(ctx));
    if (whisper_encode(ctx, 0, 1) != 0) return 1;
    whisper_token sot = whisper_token_sot(ctx);
    whisper_token toks[3] = { sot, (whisper_token)(sot + 1), 0 };
    if (whisper_decode(ctx, toks, 2, 0, 1) != 0) return 1;
    float * logits = whisper_get_logits(ctx);
    if (!logits) return 1;
    /* 2 prompt tokens -> 2 rows; both rows must hold finite floats */
    int V = whisper_n_vocab(ctx);
    double s0 = 0, s1 = 0;
    for (int i = 0; i < V; i++) { s0 += logits[i] < 0 ? -1 : 1;
                                  s1 += logits[V + i] < 0 ? -1 : 1; }
    printf("LOGITS|%d|%s\n", V, (s0 != 0 || s1 != 0) ? "ok" : "flat");

    /* per-state raw path must not disturb the ctx default state */
    struct whisper_state * st = whisper_init_state(ctx);
    if (!st) return 1;
    if (whisper_pcm_to_mel_with_state(ctx, st, pcm, n, 1) != 0) return 1;
    printf("NLEN_ST|%d\n", whisper_n_len_from_state(st));
    if (whisper_encode_with_state(ctx, st, 0, 1) != 0) return 1;
    if (whisper_decode_with_state(ctx, st, toks, 1, 0, 1) != 0) return 1;
    printf("LOGITS_ST|%s\n",
           whisper_get_logits_from_state(st) ? "ok" : "null");

    struct whisper_timings * t = whisper_get_timings(ctx);
    printf("TIMINGS|%s\n", t && t->encode_ms >= 0 ? "ok" : "bad");

    whisper_free_state(st);
    whisper_free(ctx);
    free(pcm);
    printf("LOGS|%s\n", n_logs > 0 ? "captured" : "none");
    printf("DONE\n");
    return 0;
}
