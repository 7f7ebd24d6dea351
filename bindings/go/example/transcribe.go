// Example: transcribe a 16 kHz mono WAV file with the Go binding.
//
//	go run ./example path/to/model.bin path/to/audio.wav
package main

import (
	"encoding/binary"
	"fmt"
	"os"

	whispertpu "github.com/whisper-tpu/bindings/go"
)

// readWav16k pulls float32 mono PCM out of a plain 16-bit PCM WAV.
// Real applications should use the engine loader (any container, any
// rate); this keeps the example dependency-free.
func readWav16k(path string) ([]float32, error) {
	raw, err := os.ReadFile(path)
	if err != nil {
		return nil, err
	}
	if len(raw) < 44 || string(raw[0:4]) != "RIFF" || string(raw[8:12]) != "WAVE" {
		return nil, fmt.Errorf("not a RIFF/WAVE file: %s", path)
	}
	// walk chunks to the first "data"
	off := 12
	for off+8 <= len(raw) {
		id := string(raw[off : off+4])
		sz := int(binary.LittleEndian.Uint32(raw[off+4 : off+8]))
		if id == "data" {
			body := raw[off+8 : min(off+8+sz, len(raw))]
			out := make([]float32, len(body)/2)
			for i := range out {
				s := int16(binary.LittleEndian.Uint16(body[2*i : 2*i+2]))
				out[i] = float32(s) / 32768.0
			}
			return out, nil
		}
		off += 8 + sz + sz&1
	}
	return nil, fmt.Errorf("no data chunk in %s", path)
}

func main() {
	if len(os.Args) != 3 {
		fmt.Fprintln(os.Stderr, "usage: transcribe <model.bin> <audio.wav>")
		os.Exit(2)
	}
	ctx, err := whispertpu.InitFromFile(os.Args[1])
	if err != nil {
		panic(err)
	}
	defer ctx.Close()

	samples, err := readWav16k(os.Args[2])
	if err != nil {
		panic(err)
	}
	if err := ctx.SetLanguage("en"); err != nil {
		panic(err)
	}
	if err := ctx.Process(samples, nil); err != nil {
		panic(err)
	}
	for i := 0; i < ctx.NumSegments(); i++ {
		fmt.Printf("[%6.2f -> %6.2f] %s\n",
			float64(ctx.SegmentT0(i))/100.0,
			float64(ctx.SegmentT1(i))/100.0,
			ctx.SegmentText(i))
	}
}
