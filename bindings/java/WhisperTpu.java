// Java binding for libwhisper_tpu.so — the whisper.h-compatible C ABI
// of the whisper_tpu TPU framework.
//
// Pure JDK 22+: java.lang.foreign (Panama FFM), no JNA/JNI glue and no
// native compilation step.  This plays the role of the reference's
// Java binding (reference: bindings/java/.../WhisperCppJnaLibrary.java,
// a JNA wrapper); the API here is written fresh against the
// whisper_tpu ABI.
//
// Struct field offsets come from WhisperTpuLayout.java, which is
// GENERATED from the C compiler's own offsetof() by
// tools/gen_abi_offsets.py and drift-checked by
// tests/test_bindings_abi.py — no hand-maintained layouts.
//
//   var ctx = new WhisperTpu.Context("model.bin");
//   ctx.setLanguage("en");
//   ctx.full(samples);                 // float[] 16 kHz mono PCM
//   for (var s : ctx.segments()) System.out.println(s);
package io.whispertpu;

import java.lang.foreign.Arena;
import java.lang.foreign.FunctionDescriptor;
import java.lang.foreign.Linker;
import java.lang.foreign.MemorySegment;
import java.lang.foreign.SymbolLookup;
import java.lang.foreign.ValueLayout;
import java.lang.invoke.MethodHandle;
import java.nio.file.Path;
import java.util.ArrayList;
import java.util.List;

import static java.lang.foreign.ValueLayout.ADDRESS;
import static java.lang.foreign.ValueLayout.JAVA_BYTE;
import static java.lang.foreign.ValueLayout.JAVA_FLOAT;
import static java.lang.foreign.ValueLayout.JAVA_INT;
import static java.lang.foreign.ValueLayout.JAVA_LONG;

public final class WhisperTpu {

    public static final int SAMPLE_RATE = 16_000;
    public static final int SAMPLING_GREEDY = 0;
    public static final int SAMPLING_BEAM_SEARCH = 1;

    private static final Linker LINKER = Linker.nativeLinker();
    private static final SymbolLookup LIB = loadLibrary();
    private static final Arena GLOBAL = Arena.ofShared();

    private static SymbolLookup loadLibrary() {
        String env = System.getenv("WHISPER_TPU_LIB");
        Path p = env != null ? Path.of(env)
                : Path.of("native", "libwhisper_tpu.so").toAbsolutePath();
        return SymbolLookup.libraryLookup(p, Arena.ofShared());
    }

    private static MethodHandle dl(String name, FunctionDescriptor desc) {
        return LINKER.downcallHandle(
                LIB.find(name).orElseThrow(
                        () -> new UnsatisfiedLinkError("missing symbol: " + name)),
                desc);
    }

    // ---- downcall handles (C signatures from native/whisper_tpu.h) ----
    private static final MethodHandle INIT_FROM_FILE =
            dl("whisper_init_from_file", FunctionDescriptor.of(ADDRESS, ADDRESS));
    private static final MethodHandle FREE =
            dl("whisper_free", FunctionDescriptor.ofVoid(ADDRESS));
    private static final MethodHandle DEFAULT_PARAMS_BY_REF =
            dl("whisper_full_default_params_by_ref",
               FunctionDescriptor.of(ADDRESS, JAVA_INT));
    private static final MethodHandle FREE_PARAMS =
            dl("whisper_free_params", FunctionDescriptor.ofVoid(ADDRESS));
    private static final MethodHandle FULL_REF =
            dl("whisper_full_ref",
               FunctionDescriptor.of(JAVA_INT, ADDRESS, ADDRESS, ADDRESS, JAVA_INT));
    private static final MethodHandle FULL_PARALLEL_REF =
            dl("whisper_full_parallel_ref",
               FunctionDescriptor.of(JAVA_INT, ADDRESS, ADDRESS, ADDRESS,
                                     JAVA_INT, JAVA_INT));

    private static final MethodHandle N_SEGMENTS =
            dl("whisper_full_n_segments", FunctionDescriptor.of(JAVA_INT, ADDRESS));
    private static final MethodHandle SEGMENT_T0 =
            dl("whisper_full_get_segment_t0",
               FunctionDescriptor.of(JAVA_LONG, ADDRESS, JAVA_INT));
    private static final MethodHandle SEGMENT_T1 =
            dl("whisper_full_get_segment_t1",
               FunctionDescriptor.of(JAVA_LONG, ADDRESS, JAVA_INT));
    private static final MethodHandle SEGMENT_TEXT =
            dl("whisper_full_get_segment_text",
               FunctionDescriptor.of(ADDRESS, ADDRESS, JAVA_INT));
    private static final MethodHandle SEGMENT_SPEAKER_TURN =
            dl("whisper_full_get_segment_speaker_turn_next",
               FunctionDescriptor.of(JAVA_BYTE, ADDRESS, JAVA_INT));
    private static final MethodHandle N_TOKENS =
            dl("whisper_full_n_tokens",
               FunctionDescriptor.of(JAVA_INT, ADDRESS, JAVA_INT));
    private static final MethodHandle TOKEN_TEXT =
            dl("whisper_full_get_token_text",
               FunctionDescriptor.of(ADDRESS, ADDRESS, JAVA_INT, JAVA_INT));
    private static final MethodHandle TOKEN_ID =
            dl("whisper_full_get_token_id",
               FunctionDescriptor.of(JAVA_INT, ADDRESS, JAVA_INT, JAVA_INT));
    private static final MethodHandle TOKEN_P =
            dl("whisper_full_get_token_p",
               FunctionDescriptor.of(JAVA_FLOAT, ADDRESS, JAVA_INT, JAVA_INT));
    private static final MethodHandle FULL_LANG_ID =
            dl("whisper_full_lang_id", FunctionDescriptor.of(JAVA_INT, ADDRESS));

    private static final MethodHandle IS_MULTILINGUAL =
            dl("whisper_is_multilingual", FunctionDescriptor.of(JAVA_INT, ADDRESS));
    private static final MethodHandle N_VOCAB =
            dl("whisper_n_vocab", FunctionDescriptor.of(JAVA_INT, ADDRESS));
    private static final MethodHandle TOKEN_TO_STR =
            dl("whisper_token_to_str",
               FunctionDescriptor.of(ADDRESS, ADDRESS, JAVA_INT));
    private static final MethodHandle TOKEN_EOT =
            dl("whisper_token_eot", FunctionDescriptor.of(JAVA_INT, ADDRESS));
    private static final MethodHandle TOKEN_SOT =
            dl("whisper_token_sot", FunctionDescriptor.of(JAVA_INT, ADDRESS));

    private static final MethodHandle LANG_ID =
            dl("whisper_lang_id", FunctionDescriptor.of(JAVA_INT, ADDRESS));
    private static final MethodHandle LANG_MAX_ID =
            dl("whisper_lang_max_id", FunctionDescriptor.of(JAVA_INT));
    private static final MethodHandle LANG_STR =
            dl("whisper_lang_str", FunctionDescriptor.of(ADDRESS, JAVA_INT));
    private static final MethodHandle SYSTEM_INFO =
            dl("whisper_print_system_info", FunctionDescriptor.of(ADDRESS));
    private static final MethodHandle VERSION =
            dl("whisper_version", FunctionDescriptor.of(ADDRESS));
    private static final MethodHandle PRINT_TIMINGS =
            dl("whisper_print_timings", FunctionDescriptor.ofVoid(ADDRESS));
    private static final MethodHandle RESET_TIMINGS =
            dl("whisper_reset_timings", FunctionDescriptor.ofVoid(ADDRESS));

    private WhisperTpu() {}

    private static String cString(MemorySegment s) {
        if (s.equals(MemorySegment.NULL)) return "";
        return s.reinterpret(Long.MAX_VALUE).getString(0);
    }

    private static RuntimeException rethrow(Throwable t) {
        return t instanceof RuntimeException r ? r : new RuntimeException(t);
    }

    // ---- context-free helpers ----

    public static int langId(String code) {
        try (Arena a = Arena.ofConfined()) {
            return (int) LANG_ID.invokeExact(a.allocateFrom(code));
        } catch (Throwable t) { throw rethrow(t); }
    }

    public static String langStr(int id) {
        try {
            return cString((MemorySegment) LANG_STR.invokeExact(id));
        } catch (Throwable t) { throw rethrow(t); }
    }

    public static List<String> languages() {
        try {
            int max = (int) LANG_MAX_ID.invokeExact();
            List<String> out = new ArrayList<>(max + 1);
            for (int i = 0; i <= max; i++) out.add(langStr(i));
            return out;
        } catch (Throwable t) { throw rethrow(t); }
    }

    public static String systemInfo() {
        try {
            return cString((MemorySegment) SYSTEM_INFO.invokeExact());
        } catch (Throwable t) { throw rethrow(t); }
    }

    public static String version() {
        try {
            return cString((MemorySegment) VERSION.invokeExact());
        } catch (Throwable t) { throw rethrow(t); }
    }

    /** One decoded segment of the last full() call. */
    public record Segment(int index, double t0, double t1, String text,
                          boolean speakerTurnNext) {
        @Override public String toString() {
            return String.format("[%6.2f -> %6.2f] %s", t0, t1, text);
        }
    }

    /** A loaded model plus its decode state (C whisper_context). */
    public static final class Context implements AutoCloseable {
        private MemorySegment ctx;
        private final MemorySegment params; // whisper_full_params copy
        private final Arena arena = Arena.ofShared();

        public Context(String modelPath) {
            this(modelPath, SAMPLING_GREEDY);
        }

        public Context(String modelPath, int strategy) {
            try {
                ctx = (MemorySegment) INIT_FROM_FILE.invokeExact(
                        arena.allocateFrom(modelPath));
                if (ctx.equals(MemorySegment.NULL)) {
                    throw new IllegalStateException(
                            "failed to load model: " + modelPath);
                }
                MemorySegment defaults =
                        (MemorySegment) DEFAULT_PARAMS_BY_REF.invokeExact(strategy);
                params = arena.allocate(WhisperTpuLayout.FULL_PARAMS_SIZEOF);
                MemorySegment.copy(
                        defaults.reinterpret(WhisperTpuLayout.FULL_PARAMS_SIZEOF),
                        0, params, 0, WhisperTpuLayout.FULL_PARAMS_SIZEOF);
                FREE_PARAMS.invokeExact(defaults);
            } catch (Throwable t) { throw rethrow(t); }
        }

        // ---- parameter setters (offsets from WhisperTpuLayout) ----
        private void setBool(long off, boolean v) {
            params.set(JAVA_BYTE, off, (byte) (v ? 1 : 0));
        }

        public void setTranslate(boolean v) {
            setBool(WhisperTpuLayout.FULL_PARAMS_TRANSLATE, v);
        }
        public void setNoContext(boolean v) {
            setBool(WhisperTpuLayout.FULL_PARAMS_NO_CONTEXT, v);
        }
        public void setNoTimestamps(boolean v) {
            setBool(WhisperTpuLayout.FULL_PARAMS_NO_TIMESTAMPS, v);
        }
        public void setSingleSegment(boolean v) {
            setBool(WhisperTpuLayout.FULL_PARAMS_SINGLE_SEGMENT, v);
        }
        public void setTokenTimestamps(boolean v) {
            setBool(WhisperTpuLayout.FULL_PARAMS_TOKEN_TIMESTAMPS, v);
        }
        public void setSplitOnWord(boolean v) {
            setBool(WhisperTpuLayout.FULL_PARAMS_SPLIT_ON_WORD, v);
        }
        public void setDetectLanguage(boolean v) {
            setBool(WhisperTpuLayout.FULL_PARAMS_DETECT_LANGUAGE, v);
        }

        public void setThreads(int n) {
            params.set(JAVA_INT, WhisperTpuLayout.FULL_PARAMS_N_THREADS, n);
        }
        public void setMaxLen(int n) {
            params.set(JAVA_INT, WhisperTpuLayout.FULL_PARAMS_MAX_LEN, n);
        }
        public void setMaxTokens(int n) {
            params.set(JAVA_INT, WhisperTpuLayout.FULL_PARAMS_MAX_TOKENS, n);
        }
        public void setAudioCtx(int n) {
            params.set(JAVA_INT, WhisperTpuLayout.FULL_PARAMS_AUDIO_CTX, n);
        }
        public void setBestOf(int n) {
            params.set(JAVA_INT, WhisperTpuLayout.FULL_PARAMS_GREEDY__BEST_OF, n);
        }
        public void setBeamSize(int n) {
            params.set(JAVA_INT, WhisperTpuLayout.FULL_PARAMS_STRATEGY,
                       SAMPLING_BEAM_SEARCH);
            params.set(JAVA_INT,
                       WhisperTpuLayout.FULL_PARAMS_BEAM_SEARCH__BEAM_SIZE, n);
        }
        public void setTemperature(float t) {
            params.set(JAVA_FLOAT, WhisperTpuLayout.FULL_PARAMS_TEMPERATURE, t);
        }
        public void setTemperatureInc(float t) {
            params.set(JAVA_FLOAT, WhisperTpuLayout.FULL_PARAMS_TEMPERATURE_INC, t);
        }
        public void setEntropyThold(float t) {
            params.set(JAVA_FLOAT, WhisperTpuLayout.FULL_PARAMS_ENTROPY_THOLD, t);
        }
        public void setLogprobThold(float t) {
            params.set(JAVA_FLOAT, WhisperTpuLayout.FULL_PARAMS_LOGPROB_THOLD, t);
        }
        public void setNoSpeechThold(float t) {
            params.set(JAVA_FLOAT, WhisperTpuLayout.FULL_PARAMS_NO_SPEECH_THOLD, t);
        }

        public void setLanguage(String code) {
            if (!"auto".equals(code) && langId(code) < 0) {
                throw new IllegalArgumentException("unknown language: " + code);
            }
            // arena-owned → outlives every full() call on this context
            params.set(ADDRESS, WhisperTpuLayout.FULL_PARAMS_LANGUAGE,
                       arena.allocateFrom(code));
        }

        public void setInitialPrompt(String prompt) {
            params.set(ADDRESS, WhisperTpuLayout.FULL_PARAMS_INITIAL_PROMPT,
                       arena.allocateFrom(prompt));
        }

        // ---- processing ----

        /** Transcribe mono 16 kHz PCM in [-1, 1]. */
        public void full(float[] samples) {
            full(samples, 1);
        }

        public void full(float[] samples, int nProcessors) {
            if (samples.length == 0) {
                throw new IllegalArgumentException("empty sample buffer");
            }
            try (Arena a = Arena.ofConfined()) {
                MemorySegment pcm = a.allocateFrom(JAVA_FLOAT, samples);
                int rc = nProcessors > 1
                        ? (int) FULL_PARALLEL_REF.invokeExact(
                                ctx, params, pcm, samples.length, nProcessors)
                        : (int) FULL_REF.invokeExact(
                                ctx, params, pcm, samples.length);
                if (rc != 0) {
                    throw new IllegalStateException("whisper_full failed: rc=" + rc);
                }
            } catch (Throwable t) { throw rethrow(t); }
        }

        // ---- results ----

        public int numSegments() {
            try {
                return (int) N_SEGMENTS.invokeExact(ctx);
            } catch (Throwable t) { throw rethrow(t); }
        }

        public Segment segment(int i) {
            try {
                return new Segment(
                        i,
                        (long) SEGMENT_T0.invokeExact(ctx, i) / 100.0,
                        (long) SEGMENT_T1.invokeExact(ctx, i) / 100.0,
                        cString((MemorySegment) SEGMENT_TEXT.invokeExact(ctx, i)),
                        (byte) SEGMENT_SPEAKER_TURN.invokeExact(ctx, i) != 0);
            } catch (Throwable t) { throw rethrow(t); }
        }

        public List<Segment> segments() {
            int n = numSegments();
            List<Segment> out = new ArrayList<>(n);
            for (int i = 0; i < n; i++) out.add(segment(i));
            return out;
        }

        public int numTokens(int i) {
            try {
                return (int) N_TOKENS.invokeExact(ctx, i);
            } catch (Throwable t) { throw rethrow(t); }
        }

        public String tokenText(int i, int j) {
            try {
                return cString((MemorySegment) TOKEN_TEXT.invokeExact(ctx, i, j));
            } catch (Throwable t) { throw rethrow(t); }
        }

        public int tokenId(int i, int j) {
            try {
                return (int) TOKEN_ID.invokeExact(ctx, i, j);
            } catch (Throwable t) { throw rethrow(t); }
        }

        public float tokenP(int i, int j) {
            try {
                return (float) TOKEN_P.invokeExact(ctx, i, j);
            } catch (Throwable t) { throw rethrow(t); }
        }

        public int detectedLangId() {
            try {
                return (int) FULL_LANG_ID.invokeExact(ctx);
            } catch (Throwable t) { throw rethrow(t); }
        }

        // ---- model introspection ----

        public boolean isMultilingual() {
            try {
                return (int) IS_MULTILINGUAL.invokeExact(ctx) != 0;
            } catch (Throwable t) { throw rethrow(t); }
        }

        public int numVocab() {
            try {
                return (int) N_VOCAB.invokeExact(ctx);
            } catch (Throwable t) { throw rethrow(t); }
        }

        public String tokenToStr(int tok) {
            try {
                return cString((MemorySegment) TOKEN_TO_STR.invokeExact(ctx, tok));
            } catch (Throwable t) { throw rethrow(t); }
        }

        public int tokenEot() {
            try {
                return (int) TOKEN_EOT.invokeExact(ctx);
            } catch (Throwable t) { throw rethrow(t); }
        }

        public int tokenSot() {
            try {
                return (int) TOKEN_SOT.invokeExact(ctx);
            } catch (Throwable t) { throw rethrow(t); }
        }

        public void printTimings() {
            try {
                PRINT_TIMINGS.invokeExact(ctx);
            } catch (Throwable t) { throw rethrow(t); }
        }

        public void resetTimings() {
            try {
                RESET_TIMINGS.invokeExact(ctx);
            } catch (Throwable t) { throw rethrow(t); }
        }

        @Override public void close() {
            try {
                if (!ctx.equals(MemorySegment.NULL)) {
                    FREE.invokeExact(ctx);
                    ctx = MemorySegment.NULL;
                }
            } catch (Throwable t) { throw rethrow(t); }
        }
    }
}
