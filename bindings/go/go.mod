module github.com/whisper-tpu/bindings/go

go 1.21
