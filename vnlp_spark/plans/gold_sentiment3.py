"""Third frozen sentiment gold split — blind protocol (round 4).

60 FRESH Turkish review-register sentences, hand-labelled and committed
BEFORE the first scoring run — pricing the open-vocabulary asymptote
after split 2's fixes (first-run trajectory so far: 0.517 → 0.700).
Fresh domains vs splits 1-2: veterinary clinic, driving school,
photography studio, dry cleaner, bookstore, airline, furniture store,
electrician, swimming pool, phone repair, wedding venue, pastry shop —
with vocabulary the earlier splits never used.

Same category mix, per class: 15 plain, 8 negation, 5
mixed-contrastive, 2 terse.  Mixed-register rule unchanged: the label
follows the clause after the contrastive conjunction.

Label semantics: 1 = positive, 0 = negative (reference
SentimentAnalyzer.predict at 0.5,
/root/reference/vnlp/sentiment_analyzer/sentiment_analyzer.py:26-76).
"""
from __future__ import annotations

# (text, label) — ordered: pos-plain 15, pos-negation 8, pos-mixed 5,
# pos-terse 2, then the same for negative.
GOLD_SENTIMENT3: list[tuple[str, int]] = [
    # ---- positive, plain (15) ----
    ("Veteriner kedimize çok şefkatli davrandı, aşıları ağrısız yaptı.", 1),
    ("Sürücü kursu hocası çok anlayışlıydı, direksiyonda özgüven kazandım.", 1),
    ("Fotoğrafçı ışığı harika kullanmış, albüm göz kamaştırıyor.", 1),
    ("Kuru temizlemeci lekeyi tamamen çıkarmış, ceket ilk günkü gibi.", 1),
    ("Kitapçının rafları düzenli, aradığım yayını saniyede buldum.", 1),
    ("Uçuş dakikasında kalktı, kabin ekibi son derece kibardı.", 1),
    ("Koltuk takımı fotoğraftakinden bile şık, montajı pürüzsüz ilerledi.", 1),
    ("Elektrikçi arızayı kökten çözdü, üstelik ortalığı tertemiz bıraktı.", 1),
    ("Havuzun suyu pırıl pırıl, cankurtaranlar sürekli tetikte.", 1),
    ("Telefonun ekranı yarım saatte değişti, cihaz ilk günkü performansına döndü.", 1),
    ("Düğün salonunun ışıklandırması masalsıydı, organizasyon kusursuz aktı.", 1),
    ("Pastanenin profiterolü efsane, şerbeti tam ayarında.", 1),
    ("Rehber köpek eğitimi mucize gibi, komutları anında kavradı.", 1),
    ("Fuar standındaki ekip işini aşkla yapıyor, her soruyu içtenlikle yanıtladı.", 1),
    ("Yeni matkap çok güçlü, beton duvarı zorlanmadan deldi.", 1),
    # ---- positive, negation (8) ----
    ("Randevu saatinde hiç sarkma olmadı, muayene vaktinde başladı.", 1),
    ("Direksiyon sınavında hiç panik yaşamadım, hoca iyi hazırlamış.", 1),
    ("Baskılarda renk kayması yok, kağıt kalitesi de düşmemiş.", 1),
    ("Gömlek çekmedi, yakası da deforme olmadı.", 1),
    ("Uçakta valiz kaybolmadı, aktarmada da sorun çıkmadı.", 1),
    ("Dolabın kapakları gıcırdamıyor, rayları da takılmıyor.", 1),
    ("Sigorta hiç atmıyor artık, priz de ısınmıyor.", 1),
    ("Pastanın kreması hiç ağır değil, tatlılığı rahatsız etmiyor.", 1),
    # ---- positive, mixed-contrastive (5) ----
    ("Bekleme salonu kalabalıktı ama veteriner her hayvana tek tek vakit ayırdı.", 1),
    ("Kur ücreti biraz yüksek fakat eğitimin kalitesi fazlasıyla karşılıyor.", 1),
    ("Stüdyo merkeze uzak ama çekimin sonucu yolu fazlasıyla hak etti.", 1),
    ("Sıra uzundu fakat tezgahtaki usta herkese yetişti.", 1),
    ("Web sitesi biraz karışık ama mağazadaki danışman her şeyi çözdü.", 1),
    # ---- positive, terse (2) ----
    ("On numara beş yıldız hizmet.", 1),
    ("Kesinlikle tavsiye ederim.", 1),
    # ---- negative, plain (15) ----
    ("Veteriner köpeğimize sert davrandı, muayene alelacele bitti.", 0),
    ("Sürücü kursu ders saatlerini sürekli değiştirdi, program altüst oldu.", 0),
    ("Fotoğraflar flu çıkmış, albümün cildi de dağılıyor.", 0),
    ("Kuru temizlemeci pantolonu ütüyle parlatmış, kumaş mahvoldu.", 0),
    ("Kitapçının kasiyeri ters konuştu, iade talebimi duymazdan geldi.", 0),
    ("Uçuş dört saat rötar yaptı, kimse açıklama yapmadı.", 0),
    ("Koltuğun iskeleti ilk haftada çatırdadı, kumaşı da tüylendi.", 0),
    ("Elektrikçi kabloları açıkta bıraktı, duvarı da delik deşik etti.", 0),
    ("Havuzun suyu bulanıktı, klor kokusu gözlerimizi yaktı.", 0),
    ("Tamirden gelen telefon iki gün sonra yine kapandı.", 0),
    ("Düğün salonunun sesi sürekli kesildi, pist yarıda kaldı.", 0),
    ("Pastanenin böreği bayattı, çayı da buz gibiydi.", 0),
    ("Sipariş ettiğim kitap üç hafta sonra hasarlı geldi.", 0),
    ("Standdaki görevli telefonuyla oynuyordu, soruları geçiştirdi.", 0),
    ("Matkabın şarjı yarım saatte bitti, ucu da körelmiş.", 0),
    # ---- negative, negation (8) ----
    ("Randevuya gittik ama doktor gelmedi, kimse de aramadı.", 0),
    ("Araç sınava hazır değildi, frenleri tutmuyordu.", 0),
    ("Çekim asla vaktinde başlamadı, telafi seansı da önerilmedi.", 0),
    ("Leke çıkmamış, üstelik astarı da sökülmüş.", 0),
    ("Koltuk numaralarımız yan yana değildi, mürettebat ilgilenmedi.", 0),
    ("Dolap ölçülere uymadı, montajcı bir daha uğramadı.", 0),
    ("Arıza giderilmedi, elektrikçi telefonu açmaz oldu.", 0),
    ("Pasta siparişe hiç benzemiyordu, yazı bile yanlıştı.", 0),
    # ---- negative, mixed-contrastive (5) ----
    ("Klinik modern görünüyor ama tahlil sonuçları günlerce gecikti.", 0),
    ("Hoca tatlı dilliydi fakat araç sürekli arıza yapıp dersleri böldü.", 0),
    ("Stüdyonun dekoru şıktı ama çekim dosyaları kayboldu.", 0),
    ("Mağaza ferah fakat teslimat üç kez ertelendi.", 0),
    ("Havuz geniş ama soyunma kabinleri kilitliydi, duşlar akmıyordu.", 0),
    # ---- negative, terse (2) ----
    ("Tam bir hayal kırıklığı.", 0),
    ("Paranıza yazık etmeyin.", 0),
]

# category boundaries for the per-class report (same layout as split 1)
CATS3 = [
    ("pos-plain", 0, 15), ("pos-negation", 15, 23), ("pos-mixed", 23, 28),
    ("pos-terse", 28, 30), ("neg-plain", 30, 45), ("neg-negation", 45, 53),
    ("neg-mixed", 53, 58), ("neg-terse", 58, 60),
]
