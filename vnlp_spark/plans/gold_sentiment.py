"""Frozen sentiment gold set — blind protocol (round 4).

120 Turkish review-register sentences (product / restaurant / hotel /
film / service), balanced 60 positive / 60 negative, hand-labelled
BEFORE the first scoring run and frozen by git commit, exactly like the
gold_ud blind splits.  The reference's published number to compare
against is 0.947 accuracy for its trained BiGRU
(/root/reference/vnlp/sentiment_analyzer/spu_context_bigru_sentiment.py:78).

Label semantics match the reference surface: 1 = positive, 0 = negative
(SentimentAnalyzer.predict at a 0.5 threshold,
/root/reference/vnlp/sentiment_analyzer/sentiment_analyzer.py:26-76).

Composition notes (written at annotation time, before any scoring):
- 30 plain-polarity sentences per class (clear lexical signal);
- 15 per class with negation — lexical (değil / yok / hiç) or
  morphological (-ma-/-me-/-mAz/-mIyor) — so the flip logic is probed;
- 10 per class with mixed/contrastive structure (ama / rağmen /
  fakat), labelled by the dominant clause as a human reader would;
- 5 per class in colloquial/terse register (no overt polarity stem,
  or slang), the deliberately hard tail.

Mixed-register ambiguity rule: when both clauses carry polarity, the
label follows the clause after the contrastive conjunction ("güzeldi
ama asla tavsiye etmem" -> 0), the standard convention in Turkish
review-sentiment datasets.
"""
from __future__ import annotations

# (text, label) — label 1 positive, 0 negative.
GOLD_SENTIMENT: list[tuple[str, int]] = [
    # ---- positive, plain polarity (30) ----
    ("Yemekler gerçekten çok lezzetliydi, tekrar geleceğim.", 1),
    ("Kargo bir günde elime ulaştı, paketleme özenliydi.", 1),
    ("Otelin manzarası muhteşemdi, odalar tertemizdi.", 1),
    ("Film baştan sona sürükleyiciydi, oyunculuklar harikaydı.", 1),
    ("Satıcı çok ilgiliydi, her soruma anında cevap verdi.", 1),
    ("Fiyatına göre kalitesi şahane, herkese tavsiye ederim.", 1),
    ("Garsonlar güler yüzlüydü, servis çok hızlıydı.", 1),
    ("Ürün fotoğraftakinin aynısı geldi, çok memnun kaldım.", 1),
    ("Kahvaltı çeşitleri bol ve tazeydi, bayıldık.", 1),
    ("Kitap bir solukta okunuyor, anlatım akıcı ve keyifli.", 1),
    ("Telefonun bataryası iki gün gidiyor, performansı mükemmel.", 1),
    ("Tatilin her anından keyif aldık, personel çok candandı.", 1),
    ("Mağazadaki çalışanlar yardımsever ve güler yüzlüydü.", 1),
    ("Pasta hem görüntüsüyle hem tadıyla kusursuzdu.", 1),
    ("Koltuk çok rahat, kumaşı kaliteli, kurulumu kolaydı.", 1),
    ("Konser unutulmazdı, sahne düzeni göz kamaştırıcıydı.", 1),
    ("Sipariş sıcacık geldi, porsiyonlar gayet doyurucuydu.", 1),
    ("Kulaklığın ses kalitesi beklentimin çok üzerinde çıktı.", 1),
    ("Oda servisi dakikasında geldi, yatak çok konforluydu.", 1),
    ("Dizinin senaryosu çok başarılı, her bölümü merakla bekliyorum.", 1),
    ("Berber işini gerçekten özenle yapıyor, sonuçtan çok mutluyum.", 1),
    ("Ayakkabı ayağıma tam oturdu, duruşu çok şık.", 1),
    ("Kurs eğitmeni konuları sabırla ve net anlatıyor, çok faydalı.", 1),
    ("Araç tertemiz teslim edildi, yakıt tüketimi şaşırtıcı derecede düşük.", 1),
    ("Manav her zaman taze sebze veriyor, güvenerek alışveriş yapıyorum.", 1),
    ("Uçuş dakikti, kabin ekibi son derece nazikti.", 1),
    ("Tamirci arızayı hemen buldu, ücret de gayet makuldü.", 1),
    ("Çocuklar oyun alanına bayıldı, güvenli ve bakımlıydı.", 1),
    ("Yazılımın arayüzü sezgisel, kurulumdan beri hiç takılmadı.", 1),
    ("Düğün organizasyonu kusursuz ilerledi, misafirler çok memnun ayrıldı.", 1),
    # ---- positive with negation (15) ----
    ("Hiçbir sorun yaşamadım, ürün anlatıldığı gibi çıktı.", 1),
    ("Kokusu hiç rahatsız edici değil, gayet hafif ve hoş.", 1),
    ("Beklentim yüksek değildi ama yemekler beni fena halde şaşırttı, bayıldım.", 1),
    ("Fiyatı hiç de pahalı değil, bu kaliteye değer.", 1),
    ("Kumaşı asla kaşındırmıyor, ter de yapmıyor.", 1),
    ("Servis hiç gecikmedi, sipariş eksiksiz geldi.", 1),
    ("Otelde gürültü diye bir şey yok, mis gibi uyuduk.", 1),
    ("Telefon hiç ısınmıyor, kasmadan çalışıyor.", 1),
    ("Pişman değilim, iyi ki bu modeli almışım.", 1),
    ("Kurulumda hiçbir zorluk çekmedim, beş dakikada bitti.", 1),
    ("Tadı yapay değil, gerçekten ev yapımı gibi.", 1),
    ("Kuyrukta hiç bekletmediler, işlem anında tamamlandı.", 1),
    ("Hiç beklemediğim kadar sağlam bir paketlemeyle geldi, teşekkürler.", 1),
    ("Renk solmadı, ilk günkü gibi duruyor.", 1),
    ("Yatak hiç ses yapmıyor, montajı da zor değildi.", 1),
    # ---- positive, mixed/contrastive (10) ----
    ("Kargo biraz gecikti ama ürün o kadar güzel ki hepsini unuttum.", 1),
    ("Fiyatı yüksek olmasına rağmen her kuruşuna değdi.", 1),
    ("Salon küçüktü fakat yemeklerin lezzeti her şeyi telafi etti.", 1),
    ("Başta tereddüt etmiştim ama iyi ki almışım, harika çıktı.", 1),
    ("Filmin ilk yarısı yavaştı ama finali nefes kesiciydi.", 1),
    ("Otopark sorunu var, yine de bu manzara için her şeye değer.", 1),
    ("Kutu ezik geldi ama içindeki ürün sapasağlamdı, satıcı da hemen ilgilendi.", 1),
    ("Menü kısa olsa da her tabak tek kelimeyle enfesti.", 1),
    ("Biraz bekledik ama garsonun ilgisi ve tatlı ikramı gönlümüzü aldı.", 1),
    ("Eski modeli sorunluydu, bu yenisi ise kusursuz çalışıyor.", 1),
    # ---- positive, colloquial/terse (5) ----
    ("On numara beş yıldız, gözün kapalı al.", 1),
    ("Helal olsun ustaya, eline sağlık.", 1),
    ("Tam bir cep dostu, kapatmayan kaçırır.", 1),
    ("Bu paraya bu ürün, gerisi hikaye.", 1),
    ("Yerinde yedik, parmaklarımızı da yedik.", 1),
    # ---- negative, plain polarity (30) ----
    ("Yemekler buz gibi geldi, servis rezaletti.", 0),
    ("Ürün iki günde bozuldu, tam bir hayal kırıklığı.", 0),
    ("Odalar kirliydi, çarşaflar lekeliydi, berbat bir geceydi.", 0),
    ("Film sıkıcıydı, yarısında salonu terk ettik.", 0),
    ("Satıcı mesajlarıma günlerce dönmedi, ilgisizlik had safhada.", 0),
    ("Bu fiyata bu kalite kabul edilemez, kesinlikle almayın.", 0),
    ("Garson siparişi üç kez yanlış getirdi, özür bile dilemedi.", 0),
    ("Gelen ürünün fotoğrafla uzaktan yakından alakası yok.", 0),
    ("Kahvaltı bayattı, çay soğuktu, ortalık pisti.", 0),
    ("Kitap baştan sona laf kalabalığı, tam bir zaman kaybı.", 0),
    ("Telefon sürekli donuyor, batarya yarım günde bitiyor.", 0),
    ("Tatil tam bir kabusa dönüştü, personel son derece kabaydı.", 0),
    ("Mağazada kimse yardımcı olmadı, çalışanlar suratsızdı.", 0),
    ("Pasta hem kuruydu hem de şekeri boğazımızı yaktı.", 0),
    ("Koltuğun ayağı ilk haftada kırıldı, kumaşı tüylendi.", 0),
    ("Konser tam bir fiyaskoydu, ses düzeni felaketti.", 0),
    ("Sipariş iki saat sonra soğumuş halde geldi, porsiyon da küçücüktü.", 0),
    ("Kulaklığın sesi cızırtılı, mikrofonu bir hafta sonra sustu.", 0),
    ("Klima bütün gece gürültü yaptı, göz kırpmadan sabahı ettik.", 0),
    ("Dizinin senaryosu giderek saçmalaştı, izlemeyi bıraktım.", 0),
    ("Berber saçımı mahvetti, şapkasız dışarı çıkamıyorum.", 0),
    ("Ayakkabının tabanı ilk yağmurda söküldü, rengi de attı.", 0),
    ("Eğitmen derslere sürekli geç geldi, sorulara cevap veremiyordu.", 0),
    ("Araç kirli teslim edildi, depo da boştu, yakıtı cebimizden ödedik.", 0),
    ("Manavın sattığı meyvelerin yarısı çürük çıktı.", 0),
    ("Uçuş dört saat rötar yaptı, tek bir anons bile yapılmadı.", 0),
    ("Tamirci sorunu çözemediği gibi bir de fahiş ücret istedi.", 0),
    ("Oyun alanındaki salıncaklar paslı ve tehlikeliydi.", 0),
    ("Yazılım sürekli çöküyor, kaydedilmemiş her şey gidiyor.", 0),
    ("Organizasyon tam bir karmaşaydı, misafirler aç kaldı.", 0),
    # ---- negative with negation (15) ----
    ("Hiç beğenmedim, anlatılanların hiçbiri doğru değil.", 0),
    ("Ürün hiç kaliteli durmuyor, plastik kokusu da gitmiyor.", 0),
    ("Yemeklerin tadı yoktu, sıcak bile değildi.", 0),
    ("Kesinlikle tavsiye etmiyorum, paranıza yazık.", 0),
    ("Personel güler yüzlü değildi, sorularımıza cevap vermediler.", 0),
    ("Bir daha asla sipariş vermem, bu kadarını beklemiyordum.", 0),
    ("Oda hiç temiz değildi, havlular da değiştirilmemişti.", 0),
    ("Telefonun kamerası hiç iyi çekmiyor, odaklanamıyor.", 0),
    ("Memnun kalmadım, iade süreci de bir türlü ilerlemiyor.", 0),
    ("Beden tablosu doğru değil, gelen ürün olmadı, üstelik değişim de yapmıyorlar.", 0),
    ("Lezzetli falan değil, resmen yenilir gibi değildi.", 0),
    ("Randevuya sadık değiller, iki saat bekletip özür de dilemediler.", 0),
    ("Anlatıldığı gibi sessiz çalışmıyor, uğultusu hiç kesilmiyor.", 0),
    ("Bu otele bir daha gelmem, parasının karşılığını vermiyor.", 0),
    ("Kumaş hiç nefes almıyor, yarım saatte sırılsıklam oldum.", 0),
    # ---- negative, mixed/contrastive (10) ----
    ("Ambiyans güzeldi ama yemekler o kadar kötüydü ki bir daha adım atmam.", 0),
    ("Fiyatı uygun fakat kalitesi o kadar düşük ki parasına bile değmez.", 0),
    ("Kurye kibar olsa da ürün kırık geldi, kimse sorumluluk almıyor.", 0),
    ("Manzara hoştu, gel gör ki odadaki rutubet kokusu tatili zehir etti.", 0),
    ("İlk bölümleri sürükleyiciydi ama sonu tam bir rezalet, pişman oldum.", 0),
    ("Tasarımı şık, ne var ki bir ayda iki kez servise gitti.", 0),
    ("Çalışanlar iyi niyetli ama mutfak o kadar yavaş ki yemek yemeden çıktık.", 0),
    ("Konum merkezi olmasına rağmen gürültüden ve pislikten kalınacak gibi değil.", 0),
    ("İndirimliydi evet, ama bedeni küçük geldi ve iade ücretini bize ödettiler.", 0),
    ("Paketleme özenliydi fakat içinden eksik parça çıktı, muhatap bulamıyorum.", 0),
    # ---- negative, colloquial/terse (5) ----
    ("Paranıza yazık, uzak durun.", 0),
    ("Tam bir fiyasko, elime yüzüme bulaştı.", 0),
    ("Beş kuruş etmez, çöpe attım resmen.", 0),
    ("Bir daha mı, tövbeler olsun.", 0),
    ("Aldığıma bin pişmanım, içim yandı.", 0),
]

assert len(GOLD_SENTIMENT) == 120
assert sum(lbl for _, lbl in GOLD_SENTIMENT) == 60
