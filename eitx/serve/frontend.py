"""Built-in web page for interactive use (GUI-layer parity).

The reference ships a Streamlit app (frontend/front.py) with a mode radio,
multi-file upload, and rendering of the returned timings + image. Here the
same capability is a single self-contained HTML page served by the
service itself (GET /ui) — the browser zips nothing; files are sent as-is
inside one client-built zip via JS."""

FRONTEND_HTML = """<!doctype html>
<html><head><meta charset="utf-8"><title>eitx — CT to EIT synthesizer</title>
<style>
 body{font-family:sans-serif;max-width:900px;margin:2em auto;padding:0 1em}
 fieldset{border:1px solid #ccc;margin-bottom:1em}
 img{max-width:100%%;border:1px solid #ddd;margin-top:1em}
 .t{color:#555;font-size:0.9em}
</style></head><body>
<h2>eitx — synthetic EIT dataset generator</h2>
<fieldset><legend>Mode</legend>
 <label><input type=radio name=mode value="/uploadDicomSequence" checked>
   DICOM series (auto slice)</label><br>
 <label><input type=radio name=mode value="/uploadDicomSequenceCustom">
   DICOM series (custom offset)</label><br>
 <label><input type=radio name=mode value="/uploadDicomFrame">
   Single DICOM slice</label><br>
 <label><input type=radio name=mode value="/uploadImageAxialSlice">
   JPEG/PNG axial slice</label><br>
 <label><input type=radio name=mode value="/uploadNII">
   NIfTI volume</label>
</fieldset>
<fieldset><legend>Upload</legend>
 <input type=file id=files multiple>
 <button onclick="launch()">Launch processing</button>
</fieldset>
<div id=status class=t></div>
<div id=out></div>
<script src="https://cdn.jsdelivr.net/npm/jszip@3/dist/jszip.min.js"></script>
<script>
async function launch(){
  const files = document.getElementById('files').files;
  if(!files.length){alert('choose files');return}
  const st = document.getElementById('status');
  st.textContent = 'zipping...';
  const zip = new JSZip();
  for(const f of files){ zip.file(f.name, await f.arrayBuffer()); }
  const blob = await zip.generateAsync({type:'blob'});
  const mode = document.querySelector('input[name=mode]:checked').value;
  st.textContent = 'processing (first run compiles kernels)...';
  const t0 = performance.now();
  const resp = await fetch(mode, {method:'POST', body: blob,
    headers:{'Content-Type':'application/zip'}});
  const ans = await resp.json();
  const dt = ((performance.now()-t0)/1000).toFixed(1);
  if(!resp.ok){ st.textContent = 'error: ' + (ans.detail||resp.status); return }
  st.textContent = `done in ${dt}s — segmentation ${ans.segmentation_time}s, `+
    `simulation ${ans.simulation_time.toFixed(2)}s, saved ${ans.saved_file_name}`;
  document.getElementById('out').innerHTML =
    '<img src="data:image/png;base64,' + ans.image + '">';
}
</script></body></html>
"""
