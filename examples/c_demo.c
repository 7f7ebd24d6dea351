/* Minimal whisper.h-style C program against libwhisper_tpu.so
 * (mirrors the reference examples/main usage pattern).
 *
 *   gcc c_demo.c -I../native -L../native -lwhisper_tpu -o c_demo
 *   LD_LIBRARY_PATH=../native ./c_demo model.bin audio_f32le.raw
 *
 * audio input: raw float32 little-endian mono 16 kHz (use ffmpeg or
 * tools/wav_to_f32.py to convert).
 */
#include <stdio.h>
#include <stdlib.h>

#include "whisper_tpu.h"

static void on_new_segment(struct whisper_context * ctx,
                           struct whisper_state * state, int n_new,
                           void * user_data) {
    (void) state;
    const int n = whisper_full_n_segments(ctx);
    for (int i = n - n_new; i < n; i++) {
        printf("[%6.2f -> %6.2f] %s\n",
               whisper_full_get_segment_t0(ctx, i) / 100.0,
               whisper_full_get_segment_t1(ctx, i) / 100.0,
               whisper_full_get_segment_text(ctx, i));
    }
    (*(int *) user_data) += n_new;
}

int main(int argc, char ** argv) {
    if (argc < 3) {
        fprintf(stderr, "usage: %s model.bin audio_f32le.raw\n", argv[0]);
        return 1;
    }

    struct whisper_context * ctx = whisper_init_from_file(argv[1]);
    if (!ctx) {
        fprintf(stderr, "failed to load %s\n", argv[1]);
        return 1;
    }
    printf("n_vocab=%d multilingual=%d eot=%d sys=%s\n",
           whisper_n_vocab(ctx), whisper_is_multilingual(ctx),
           whisper_token_eot(ctx), whisper_print_system_info());

    FILE * f = fopen(argv[2], "rb");
    if (!f) { fprintf(stderr, "no audio\n"); return 1; }
    fseek(f, 0, SEEK_END);
    long bytes = ftell(f);
    fseek(f, 0, SEEK_SET);
    float * pcm = malloc(bytes);
    if (fread(pcm, 1, bytes, f) != (size_t) bytes) { return 1; }
    fclose(f);
    const int n_samples = (int) (bytes / 4);

    whisper_token toks[16];
    int n_tok = whisper_tokenize(ctx, " and so", toks, 16);
    printf("tokenize ' and so' -> %d tokens\n", n_tok);

    struct whisper_full_params params =
        whisper_full_default_params(WHISPER_SAMPLING_GREEDY);
    params.print_progress = false;
    params.temperature_inc = 0.0f;
    int n_cb_segments = 0;
    params.new_segment_callback = on_new_segment;
    params.new_segment_callback_user_data = &n_cb_segments;

    if (whisper_full(ctx, params, pcm, n_samples) != 0) {
        fprintf(stderr, "whisper_full failed\n");
        return 1;
    }

    const int n = whisper_full_n_segments(ctx);
    printf("segments=%d callback_segments=%d lang=%s\n", n, n_cb_segments,
           whisper_lang_str(whisper_full_lang_id(ctx)));
    for (int i = 0; i < n; i++) {
        whisper_token_data d = whisper_full_get_token_data(ctx, i, 0);
        printf("SEG|%lld|%lld|%s|tok0=%d p=%.3f\n",
               (long long) whisper_full_get_segment_t0(ctx, i),
               (long long) whisper_full_get_segment_t1(ctx, i),
               whisper_full_get_segment_text(ctx, i), d.id, d.p);
    }
    whisper_print_timings(ctx);
    whisper_free(ctx);
    free(pcm);
    return 0;
}
