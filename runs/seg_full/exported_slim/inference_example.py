import numpy as np
# minimal consumer using any ONNX runtime:
#   session = onnxruntime.InferenceSession("model_fp16.onnx")
img = np.random.rand(1, 3, 320, 240).astype(np.float32)
mean = np.array([0.485, 0.456, 0.406], np.float32).reshape(1, 3, 1, 1)
std = np.array([0.229, 0.224, 0.225], np.float32).reshape(1, 3, 1, 1)
x = (img - mean) / std
# out = session.run(["output"], {"input": x})[0]
# mask = out.argmax(axis=1).astype(np.uint8)
